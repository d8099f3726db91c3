package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.lake.Meta.TagEntry

/** Incrementally-maintained materialized views over the change feed.
  *
  * The reference stores only LOGICAL views (`ducklake_view`,
  * sql/pg_ducklake--0.1.0.sql); at 100 TB the missing piece is a grouped
  * aggregate a consumer can read without rescanning the fact table. This
  * module materializes `SELECT groups..., COUNT(*), SUM(cols)... FROM src
  * GROUP BY groups` as a lake table and maintains it from the SAME
  * snapshot-range change feed the reference exposes (A16): a refresh reads
  * ONLY `tableChanges(src, lastApplied, current)` — never the source table
  * — folds it into a per-group delta with ±1 weights (insert /
  * update_postimage = +1, delete / update_preimage = −1; exactly the
  * pre/post-image contract of `table_changes`,
  * sql/pg_ducklake--0.1.0.sql:344-449), and full-outer-merges the delta
  * into the (small, aggregated) MV state.
  *
  * Exactly-once refresh: the applied-watermark tag (`mv_last`) commits IN
  * THE SAME snapshot as the MV data overwrite — the streaming sink's
  * txn-tag idiom — with an in-commit re-check, so a crashed or concurrent
  * refresh can never double-apply a delta.
  *
  * Scale shape: refresh cost is O(changed bytes) + O(|MV|), with the MV
  * by construction the size of the group domain, not the fact. The merge
  * is a full-outer join of two SMALL inputs; nothing rescans the source.
  *
  * v1 limits (documented, enforced): additive aggregates only — COUNT(*)
  * plus SUM over INTEGRAL columns (exact longs; double sums are
  * order-dependent and min/max are not maintainable under deletes without
  * per-group recompute). A group whose summed column is entirely NULL
  * reports 0, not NULL (the additive identity).
  */
object LakeMaterializedView {

  private val KSource = "mv_source"
  private val KGroups = "mv_groups"
  private val KSums = "mv_sums"
  private val KMinMax = "mv_minmax"
  private val KLast = "mv_last"

  private def fullAgg(groupCols: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String])(df: DataFrame): DataFrame = {
    val aggs = (count(lit(1)).cast("long").as("n_rows") +:
      (sumCols.map(c => coalesce(sum(col(c)), lit(0L)).cast("long").as(s"sum_$c")) ++
        minMaxCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c")))))
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Create `name` as a materialized grouped aggregate of `source` at the
    * CURRENT snapshot; the definition and the applied watermark land in
    * the same commit as the initial full compute.
    *
    * `minMaxCols` adds `min_<c>`/`max_<c>` columns. MIN/MAX are not
    * additive — inserts fold monotonically, but a delete can retire the
    * current extremum — so refresh recomputes DIRTY groups (those with a
    * delete or update_preimage in the window) from the source restricted
    * to exactly those groups: when the group column is the source's
    * partition or sort key, that rescan file-prunes through the runtime
    * filter machinery instead of scanning the fact. */
  def create(lake: Lake, name: String, source: String,
      groupCols: Seq[String], sumCols: Seq[String],
      minMaxCols: Seq[String] = Nil): Long = {
    require(groupCols.nonEmpty, "materialized view needs at least one group column")
    val st = lake.store.state()
    val srcEntry = lake.schemaOf(source)
    val se = st.tableAt(srcEntry._1, srcEntry._2, st.currentSnapshotId)
      .getOrElse(throw new NoSuchElementException(s"no table $source"))
    val types = st.columnsAt(se.tableId, st.currentSnapshotId)
      .map(c => c.name -> c.dataType.toLowerCase).toMap
    sumCols.foreach { c =>
      val t = types.getOrElse(c, sys.error(s"no column $c in $source"))
      require(Set("tinyint", "smallint", "int", "bigint")(t),
        s"mv SUM column $c must be integral (exact additive), got $t")
    }
    minMaxCols.foreach(c =>
      require(types.contains(c), s"no column $c in $source"))
    val snap = st.currentSnapshotId
    val full = fullAgg(groupCols, sumCols, minMaxCols)(
      lake.table(source, Some(snap)))
    lake.createTable(name, full.schema)
    val (sn, tn) = lake.schemaOf(name)
    LakeWrite.append(lake.spark, lake.store, sn, tn, full,
      changeTag = "inserted",
      extraTags = (stc, sid) => {
        val tid = stc.tableAt(sn, tn, stc.currentSnapshotId).get.tableId.toString
        (List(
          TagEntry(tid, KSource, source, sid, None),
          TagEntry(tid, KGroups, groupCols.mkString(","), sid, None),
          TagEntry(tid, KSums, sumCols.mkString(","), sid, None),
          TagEntry(tid, KMinMax, minMaxCols.mkString(","), sid, None),
          TagEntry(tid, KLast, snap.toString, sid, None)), Nil)
      })
  }

  /** Fold the change feed since the last refresh into the MV. Returns the
    * newly-applied source snapshot id (== previous watermark when there
    * was nothing to apply). */
  def refresh(lake: Lake, name: String): Long = {
    val st = lake.store.state()
    val (sn, tn) = lake.schemaOf(name)
    val e = st.tableAt(sn, tn, st.currentSnapshotId)
      .getOrElse(throw new NoSuchElementException(s"no materialized view $name"))
    val scope = e.tableId.toString
    def tag(k: String): String = st.tagAt(scope, k, st.currentSnapshotId)
      .getOrElse(throw new IllegalStateException(s"$name is not a materialized view (missing $k)"))
    val source = tag(KSource)
    val groupCols = tag(KGroups).split(',').toSeq
    val sumCols = tag(KSums).split(',').toSeq.filter(_.nonEmpty)
    val minMaxCols = st.tagAt(scope, KMinMax, st.currentSnapshotId)
      .map(_.split(',').toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    val last = tag(KLast).toLong
    val cur = st.currentSnapshotId
    if (cur <= last) return last

    // no-op early-out WITHOUT a commit: snapshot ids are lake-global (the
    // MV's own refreshes advance them), so `cur > last` alone does not
    // mean the SOURCE changed — without this check a periodic refresh on
    // an idle source rewrites the whole MV every call (O(|MV|) write
    // amplification + snapshot churn). Catalog vectors are in memory;
    // logical source changes = data files / inline batches beginning in
    // the window, delete files beginning in it, or inline batches ENDED
    // in it (inline-row deletes).
    val (ssn, stn) = lake.schemaOf(source)
    val srcTid = st.tableAt(ssn, stn, cur)
      .getOrElse(throw new NoSuchElementException(s"no table $source")).tableId
    def in(b: Long) = b > last && b <= cur
    val sourceChanged =
      st.files.exists(f => f.tableId == srcTid && in(f.begin)) ||
        st.deleteFiles.exists(d => d.tableId == srcTid && in(d.begin)) ||
        st.inlined.exists(ib => ib.tableId == srcTid &&
          (in(ib.begin) || ib.end.exists(in)))
    if (!sourceChanged) return last

    // persist: the change-feed scan is embedded up to three times in the
    // merged plan (delta agg, dirty anti, dirty semi) — same idiom as
    // LakeWrite.delete/update's `matched`
    val changes = lake.tableChanges(source, last, cur).persist()
    try {
      val w = when(col("_change_type").isin("insert", "update_postimage"), 1L)
        .otherwise(-1L)
      // counts/sums are additive over the signed change rows; min/max fold
      // over INSERTED rows only (monotone) — deleted extrema are handled by
      // the dirty-group recompute below
      val ins = col("_change_type").isin("insert", "update_postimage")
      val delta = changes.groupBy(groupCols.map(col): _*)
        .agg(sum(w).as("d_n"),
          sumCols.map(c => coalesce(sum(w * col(c)), lit(0L)).as(s"d_$c")) ++
            minMaxCols.flatMap(c => Seq(
              min(when(ins, col(c))).as(s"d_min_$c"),
              max(when(ins, col(c))).as(s"d_max_$c"))): _*)
        // group columns renamed so the joins below can use NULL-SAFE
        // equality: a using-join's EqualTo never matches a NULL group key
        // with itself, which would split a NULL group into stale+delta rows
        .select(groupCols.map(c => col(c).as(s"_g_$c")) ++
          (Seq(col("d_n")) ++ sumCols.map(c => col(s"d_$c")) ++
            minMaxCols.flatMap(c => Seq(col(s"d_min_$c"), col(s"d_max_$c")))): _*)
      def nullSafeCond(right: DataFrame): Column =
        groupCols.map(c => col(c) <=> right(s"_g_$c")).reduce(_ && _)
      val old = lake.table(name)
      val folded = old.join(delta, nullSafeCond(delta), "full_outer")
        .select(groupCols.map(c => coalesce(col(c), col(s"_g_$c")).as(c)) ++
          Seq((coalesce(col("n_rows"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
            .as("n_rows")) ++
          sumCols.map(c => (coalesce(col(s"sum_$c"), lit(0L)) +
            coalesce(col(s"d_$c"), lit(0L))).as(s"sum_$c")) ++
          minMaxCols.flatMap(c => Seq(
            least(col(s"min_$c"), col(s"d_min_$c")).as(s"min_$c"),
            greatest(col(s"max_$c"), col(s"d_max_$c")).as(s"max_$c"))): _*)
        .filter(col("n_rows") > 0)
      val merged =
        if (minMaxCols.isEmpty) folded
        else {
          // groups whose extrema may have RETIRED: recompute them whole
          // from the source restricted to those groups (group-col runtime
          // filter → file pruning when the group is a partition/sort key);
          // all other groups keep the folded monotone min/max
          val dirty = changes
            .filter(col("_change_type").isin("delete", "update_preimage"))
            .select(groupCols.map(c => col(c).as(s"_g_$c")): _*).distinct()
          val clean = folded.join(dirty, nullSafeCond(dirty), "left_anti")
          // PIN the recompute at `cur`: a concurrent source commit between
          // the change-feed read and this scan would otherwise mix two
          // source states inside one refresh (folded groups at cur,
          // recomputed groups at a later snapshot) under a watermark of cur
          val recomputed = fullAgg(groupCols, sumCols, minMaxCols)(
            lake.table(source, Some(cur))
              .join(dirty, nullSafeCond(dirty), "left_semi"))
          clean.unionByName(recomputed)
        }
      LakeWrite.append(lake.spark, lake.store, sn, tn, merged, overwrite = true,
        changeTag = "updated",
        extraTags = (stc, sid) => {
          // in-commit re-check (the sink's idiom): a concurrent refresh
          // that already advanced the watermark aborts this one at the CAS
          val nowLast = stc.tagAt(scope, KLast, stc.currentSnapshotId)
            .map(_.toLong).getOrElse(-1L)
          if (nowLast != last) throw new IllegalStateException(
            s"concurrent refresh of $name already applied snapshot $nowLast")
          (List(TagEntry(scope, KLast, cur.toString, sid, None)),
            List(s"$scope:$KLast"))
        })
    } finally changes.unpersist()
    cur
  }
}
