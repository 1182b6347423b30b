package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve keys for multi-dimensional data clustering —
  * the write-side layout lever behind 100 TB scan economics: sorting a
  * table by the interleaved key gives every parquet row group a tight
  * min/max box on ALL interleaved dimensions at once, so a
  * multi-column range predicate prunes row groups on every dimension,
  * where a single-column sort only prunes on the sort prefix.
  * (Same construction as Delta/Iceberg OPTIMIZE ZORDER BY; reference
  * has no layout control at all — its tables are unsorted heaps.)
  *
  * Pure integer bit-spreading (the classic magic-mask dilation), so
  * the key is engine-portable and exactly reproducible anywhere —
  * ZOrderSpec pins Spark == from-scratch Scala == DuckDB oracle.
  *
  * Two z-order layers serve different jobs: THIS one is the exact,
  * portable key function (min-max scaled fixed 16-bit dims — an
  * oracle-checkable value any engine can recompute, q55); the
  * catalog's `overwriteZOrdered` is the managed write path, which
  * rank-normalizes each column by approximate quantiles instead
  * (skew-proof, but sketch-dependent and so not bit-reproducible
  * across engines). Use the catalog face for tables it owns; use
  * this key when the layout must be recomputable elsewhere.
  */
object ZOrder {

  /** The magic-mask dilation ladder: (shift, mask) pairs that spread
    * the low 16 bits of a long so bit i lands at position 2i.
    */
  val SpreadLadder: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Dilate the low 16 bits of `x`: bit i → position 2i. */
  def spread16(x: Column): Column =
    SpreadLadder.foldLeft(x.bitwiseAND(lit(0xFFFFL))) {
      case (v, (sh, mask)) => v.bitwiseOR(shiftleft(v, sh)).bitwiseAND(lit(mask))
    }

  /** 32-bit Morton key: `a`'s bits at even positions, `b`'s at odd. */
  def interleave16(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Min-max scale a dimension onto the full 16-bit range before
    * interleaving. Skipping this step degenerates the curve: a
    * dimension spanning few bits contributes nothing to the key's
    * high bits and the "z-order" collapses toward a single-column
    * sort of the wider dimension (ZOrderSpec measures exactly this).
    * Integer arithmetic only — deterministic on any engine.
    */
  def normalize16(x: Column, min: Long, max: Long): Column =
    if (max <= min) lit(0L)
    else
      // Column./ is double division; the products stay far below 2^53
      // and quotients can't sit within an ulp of an integer (divisor
      // <= 65535), so the truncating long cast is exact integer div
      ((x - lit(min)) * lit(65535L) / lit(max - min)).cast("long")

  /** Reference implementation on plain longs (spec twin). */
  def interleave16(a: Long, b: Long): Long = {
    def spread(x0: Long): Long =
      SpreadLadder.foldLeft(x0 & 0xFFFFL) {
        case (v, (sh, mask)) => (v | (v << sh)) & mask
      }
    spread(a) | (spread(b) << 1)
  }

  /** DuckDB-side twin of [[spread16]] over SQL expression `x`. The
    * fold duplicates the accumulator textually (2^4 copies of the
    * base term) — fine for an oracle, where clarity of equivalence
    * beats brevity.
    */
  def spreadSql(x: String): String =
    SpreadLadder.foldLeft(s"($x & 65535)") {
      case (acc, (sh, mask)) => s"((($acc) | (($acc) << $sh)) & $mask)"
    }

  def interleaveSql(a: String, b: String): String =
    s"(${spreadSql(a)} | ((${spreadSql(b)}) << 1))"
}
