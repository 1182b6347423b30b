package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-insensitive reconciliation checksum — the cross-system
  * table-compare primitive behind migration/replication validation
  * ("does the copy hold exactly the same rows?") without shipping or
  * sorting either side. Per-row: a 60-bit md5 digest of a canonical
  * column rendering, reduced mod 2³¹−1. Per-table: the SUM of row
  * digests mod 2³¹−1 — a commutative monoid, so the checksum is
  * independent of row order, partitioning, and cluster width, and
  * partial checksums of disjoint splits COMBINE: ck(A ∪ B) =
  * (ck(A) + ck(B)) mod P. Sums accumulate in decimal(38,0) so 10¹⁴
  * rows cannot overflow (the t28 Mersenne lesson).
  *
  * Scale: one narrow projection + one all-partial aggregate — no
  * shuffle of data rows at all (the aggregate moves one partial sum
  * per partition); comparing two 100 TB tables costs two scans and
  * exchanges 16 bytes. Consumed by q67 (oracle-pinned both
  * directions) and ReconcileSpec (monoid + invariance + sensitivity).
  */
object Reconcile {

  /** 2³¹−1 — prime, so per-row digests spread uniformly, and small
    * enough that a decimal(38,0) sum holds ~10¹⁴ rows of headroom.
    */
  val MersenneP = 2147483647L

  /** Per-row digest: leading 60 bits (15 hex nibbles — the widest
    * slice `conv` returns exactly in a long) of md5 over the canonical
    * rendering, reduced mod P.
    */
  def rowDigest(canonical: Column): Column =
    pmod(conv(substring(md5(canonical), 1, 15), 16, 10).cast("long"),
      lit(MersenneP))

  /** Aggregate column: the table checksum over a canonical rendering.
    * Use inside `df.agg(...)`; combine split checksums with
    * `combine`.
    */
  def checksumAgg(canonical: Column): Column =
    (sum(rowDigest(canonical).cast("decimal(38,0)")) % MersenneP)
      .cast("long")

  /** Whole-table convenience: the checksum as a value. */
  def checksum(df: DataFrame, canonical: Column): Long =
    df.agg(checksumAgg(canonical).as("checksum")).head().getLong(0)

  /** Monoid combine of disjoint-split checksums. */
  def combine(checksums: Seq[Long]): Long =
    checksums.foldLeft(0L)((a, b) => (a + b) % MersenneP)
}
