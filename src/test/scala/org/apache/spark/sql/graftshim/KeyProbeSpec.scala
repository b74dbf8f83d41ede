package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The delete-set probe in isolation: the sorted-array integral path,
  * the UTF8String map path, the generic UnsafeRow fallback — and the
  * range test (`noKeyIn`) that licenses probe-free reads off manifest
  * key stats. */
class KeyProbeSpec extends AnyFunSuite {

  private def longEntry(k: java.lang.Long, snap: Long): (Array[Byte], Long) = {
    val proj = UnsafeProjection.create(Array[DataType](LongType))
    val row = InternalRow(if (k == null) null else k.longValue())
    (proj(row).getBytes.clone(), snap)
  }

  private def strEntry(k: String, snap: Long): (Array[Byte], Long) = {
    val proj = UnsafeProjection.create(Array[DataType](StringType))
    val row = InternalRow(if (k == null) null else UTF8String.fromString(k))
    (proj(row).getBytes.clone(), snap)
  }

  private def longRow(v: Long): InternalRow = {
    val proj = UnsafeProjection.create(Array[DataType](LongType))
    proj(InternalRow(v)).copy()
  }

  test("single long key builds the sorted-array probe: hits, misses, " +
    "newest-snapshot dedupe") {
    val probe = KeyProbe.build(
      Array(longEntry(10L, 3), longEntry(5L, 7), longEntry(10L, 9)),
      Array(0), Array[DataType](LongType))
    assert(probe.isInstanceOf[LongKeyProbe])
    assert(probe.snapOf(longRow(5L)) == 7L)
    // duplicate key keeps the NEWEST delete snapshot
    assert(probe.snapOf(longRow(10L)) == 9L)
    assert(probe.snapOf(longRow(6L)) == KeyProbe.None)
  }

  test("noKeyIn: absence provable exactly at the boundaries") {
    val probe = KeyProbe.build(
      Array(longEntry(100L, 1), longEntry(200L, 1), longEntry(300L, 1)),
      Array(0), Array[DataType](LongType))
    assert(probe.noKeyIn(0L, 99L))
    assert(probe.noKeyIn(101L, 199L))
    assert(probe.noKeyIn(301L, Long.MaxValue))
    assert(!probe.noKeyIn(0L, 100L), "boundary key inside the range")
    assert(!probe.noKeyIn(300L, 400L))
    assert(!probe.noKeyIn(150L, 250L))
    assert(!probe.noKeyIn(Long.MinValue, Long.MaxValue))
  }

  test("a null delete key punts to the generic probe (which resolves it)") {
    val probe = KeyProbe.build(
      Array(longEntry(5L, 2), longEntry(null, 4)),
      Array(0), Array[DataType](LongType))
    assert(probe.isInstanceOf[GenericKeyProbe])
    assert(probe.snapOf(longRow(5L)) == 2L)
    // the range test stays conservative on the generic path
    assert(!probe.noKeyIn(6L, 7L))
    val nullRow = {
      val proj = UnsafeProjection.create(Array[DataType](LongType))
      proj(InternalRow(null)).copy()
    }
    assert(probe.snapOf(nullRow) == 4L,
      "a null delete key must still target null-keyed rows exactly")
  }

  test("single string key builds the UTF8String-map probe") {
    val probe = KeyProbe.build(
      Array(strEntry("doc-a", 2), strEntry("doc-b", 5), strEntry("doc-a", 8)),
      Array(0), Array[DataType](StringType))
    assert(probe.isInstanceOf[Utf8KeyProbe])
    val proj = UnsafeProjection.create(Array[DataType](StringType))
    def row(s: String) = proj(InternalRow(UTF8String.fromString(s))).copy()
    assert(probe.snapOf(row("doc-a")) == 8L)
    assert(probe.snapOf(row("doc-b")) == 5L)
    assert(probe.snapOf(row("doc-c")) == KeyProbe.None)
  }

  test("composite key falls back to the generic probe; probe matches " +
    "whole-key equality only") {
    val types = Array[DataType](LongType, StringType)
    val proj = UnsafeProjection.create(types)
    def entry(id: Long, s: String, snap: Long) =
      (proj(InternalRow(id, UTF8String.fromString(s))).getBytes.clone(), snap)
    val probe = KeyProbe.build(Array(entry(1L, "x", 3)), Array(0, 1), types)
    assert(probe.isInstanceOf[GenericKeyProbe])
    def row(id: Long, s: String) =
      proj(InternalRow(id, UTF8String.fromString(s))).copy()
    assert(probe.snapOf(row(1L, "x")) == 3L)
    assert(probe.snapOf(row(1L, "y")) == KeyProbe.None)
    assert(probe.snapOf(row(2L, "x")) == KeyProbe.None)
  }

  test("integral widths: int/date keys probe through the 4-byte accessor") {
    val proj = UnsafeProjection.create(Array[DataType](IntegerType))
    def entry(k: Int, snap: Long) =
      (proj(InternalRow(k)).getBytes.clone(), snap)
    val probe = KeyProbe.build(Array(entry(42, 6)), Array(0),
      Array[DataType](IntegerType))
    assert(probe.isInstanceOf[LongKeyProbe])
    assert(probe.snapOf(proj(InternalRow(42)).copy()) == 6L)
    assert(probe.snapOf(proj(InternalRow(41)).copy()) == KeyProbe.None)
    assert(probe.noKeyIn(43L, 100L) && !probe.noKeyIn(40L, 45L))
    // DateType shares the int physical domain
    assert(KeyProbe.integralWidth(DateType) == 4)
    assert(KeyProbe.integralWidth(TimestampType) == 8)
    assert(KeyProbe.integralWidth(StringType) == 0)
  }
}
