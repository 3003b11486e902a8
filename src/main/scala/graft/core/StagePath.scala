package graft.core

import java.time.LocalDate

/** Path grammar for staged tables.
  *
  * Mirrors the reference's S3 key layout
  * `ad-manager/{alias}/{network}/{stage}/{fmt}/year=Y/month=M/day=D/...`
  * (reference: ingestion.py:247, cleansing.py:82-84, transformation.py:463-465,
  * loading.py:2006-2010) but as Hive-style partition directories so Spark's
  * partition discovery + pruning work out of the box: a reader filtering on
  * year/month/day touches only the matching directories — at 100 TB that is
  * the difference between scanning one day and scanning the lake.
  */
final case class StagePath(
    root: String,
    source: String,
    alias: String,
    stage: String, // raw | cleansing | partitioning | transformation | warehouse
    fmt: String    // json | csv | parquet
) {
  def dir: String = s"$root/$source/$alias/$stage/$fmt"
  def forDate(d: LocalDate): String =
    f"$dir/year=${d.getYear}%d/month=${d.getMonthValue}%02d/day=${d.getDayOfMonth}%02d"
}
