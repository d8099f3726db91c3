package graft.lake

import Meta._

/** Multi-statement transaction grouping (VERDICT r4 #2; reference contract:
  * test/regression/sql/transaction.sql and
  * test/isolation/specs/explicit_transaction_commit.spec — `BEGIN; two
  * INSERTs; COMMIT` lands as ONE snapshot, and a rolled-back transaction is
  * observably absent).
  *
  * Mechanism: ops inside `lake.transaction { tx => ... }` run against a
  * [[StagingStore]] — `state()` is the transaction-start base state plus the
  * staged deltas (reads-your-own-writes and snapshot isolation for free;
  * data files are written to their final locations eagerly, metadata is
  * what's deferred). At the end the staged deltas are merged into ONE
  * CommitDelta claiming `baseSid + 1` via the normal crash-atomic CAS.
  *
  * Concurrency: strictly serial — if ANY other writer committed after the
  * transaction began, the commit aborts with
  * `ConcurrentModificationException` and every staged data file is removed
  * (rollback). This is deliberate: staged ops allocated table/file/batch ids
  * from the pinned base state, so an intervening commit can make those ids
  * collide; PG resolves the same situation by failing the serializable
  * transaction and letting the client retry, which is the contract callers
  * get here.
  */
private[lake] class StagingStore(base: MetadataStore) extends MetadataStore(base.root) {
  private[lake] val baseState: CatalogState = base.state()
  private[lake] val baseSid: Long = baseState.currentSnapshotId
  private[lake] val staged = scala.collection.mutable.ArrayBuffer.empty[CommitDelta]
  // incrementally-folded state: base + every staged delta so far. Folding
  // on read instead (base + all deltas per state() call) is O(ops²) across
  // a transaction — a 10k-statement batch load pays ~50M delta folds.
  private var folded: CatalogState = baseState

  override def state(): CatalogState = synchronized { folded }

  override def commit(delta: CommitDelta): Unit = synchronized {
    // in-transaction "commit": append to the staging log. No CAS needed —
    // the staging store is single-transaction-scoped by construction.
    staged += delta
    folded = Meta.apply(folded, delta)
  }

  // a checkpoint of STAGED state must never reach disk — uncommitted
  // transaction effects would leak to every cold reader
  override def checkpoint(): Long = state().currentSnapshotId

  /** all data-file/delete-file paths the staged ops wrote (rollback set) */
  private[lake] def stagedPaths: Seq[String] = synchronized {
    staged.flatMap(d => d.newFiles.map(_.path) ++ d.newDeleteFiles.map(_.path)).toSeq
  }
}

private[lake] object LakeTransaction {

  /** Merge the staged deltas into ONE delta claiming `finalSid`.
    *
    * Snapshot-id remapping: every id the staging store handed out
    * (`> baseSid`) becomes `finalSid` — in entity intervals, in
    * `schemaVersion` stamps, and in scheduled deletions.
    *
    * Intra-transaction lifecycle: [[Meta.apply]] ends rows only against the
    * PRIOR state, so an entity created by staged delta i and ended by a
    * later staged delta j must be end-stamped HERE (begin = end = finalSid
    * → never visible at any snapshot — exactly the transaction semantics).
    * Entities from the base state that staged deltas ended go into the
    * merged `ended*` lists as usual. An id both pre-existing and re-created
    * in-transaction (rename epochs) works because only entries created
    * BEFORE the ending delta get stamped.
    */
  def merge(baseSid: Long, staged: Seq[CommitDelta], finalSid: Long,
      timeMs: Long): CommitDelta = {
    def rb(v: Long): Long = if (v > baseSid) finalSid else v
    def re(e: Option[Long]): Option[Long] = e.map(rb)

    // generic per-class merge: collect new entries across deltas, stamping
    // end when a LATER delta's ended list names this entry's id
    def mergeNew[A, I](news: CommitDelta => List[A], ended: CommitDelta => List[I],
        idOf: A => I, remap: A => A, stamp: A => A, endOf: A => Option[Long]): List[A] =
      staged.zipWithIndex.flatMap { case (d, i) =>
        news(d).map { a =>
          val endedLater = staged.drop(i + 1).exists(d2 => ended(d2).contains(idOf(a)))
          val a2 = remap(a)
          if (endedLater && endOf(a2).isEmpty) stamp(a2) else a2
        }
      }.toList

    val snap = Snapshot(
      snapshotId = finalSid,
      snapshotTimeMs = timeMs,
      schemaVersion = rb(staged.last.snapshot.schemaVersion),
      changes = staged.flatMap(_.snapshot.changes).toList,
      commitMessage = staged.flatMap(_.snapshot.commitMessage).headOption)

    CommitDelta(
      snapshot = snap,
      newTables = mergeNew[TableEntry, Long](_.newTables, _.endedTables,
        _.tableId, t => t.copy(begin = rb(t.begin), end = re(t.end)),
        _.copy(end = Some(finalSid)), _.end),
      endedTables = staged.flatMap(_.endedTables).distinct.toList,
      newColumns = mergeNew[ColumnEntry, String](_.newColumns, _.endedColumns,
        c => s"${c.tableId}:${c.columnId}",
        c => c.copy(begin = rb(c.begin), end = re(c.end)),
        _.copy(end = Some(finalSid)), _.end),
      endedColumns = staged.flatMap(_.endedColumns).distinct.toList,
      newFiles = mergeNew[DataFileEntry, Long](_.newFiles, _.endedFiles,
        _.fileId,
        f => f.copy(begin = rb(f.begin), end = re(f.end),
          schemaVersion = rb(f.schemaVersion)),
        _.copy(end = Some(finalSid)), _.end),
      endedFiles = staged.flatMap(_.endedFiles).distinct.toList,
      newDeleteFiles = mergeNew[DeleteFileEntry, Long](_.newDeleteFiles,
        _.endedDeleteFiles, _.deleteFileId,
        f => f.copy(begin = rb(f.begin), end = re(f.end)),
        _.copy(end = Some(finalSid)), _.end),
      endedDeleteFiles = staged.flatMap(_.endedDeleteFiles).distinct.toList,
      newStats = staged.flatMap(_.newStats).toList,
      newPartitionInfo = mergeNew[PartitionInfoEntry, Long](_.newPartitionInfo,
        _.endedPartitionInfo, _.tableId,
        p => p.copy(begin = rb(p.begin), end = re(p.end)),
        _.copy(end = Some(finalSid)), _.end),
      endedPartitionInfo = staged.flatMap(_.endedPartitionInfo).distinct.toList,
      newSortInfo = mergeNew[SortInfoEntry, Long](_.newSortInfo, _.endedSortInfo,
        _.tableId, p => p.copy(begin = rb(p.begin), end = re(p.end)),
        _.copy(end = Some(finalSid)), _.end),
      endedSortInfo = staged.flatMap(_.endedSortInfo).distinct.toList,
      newInlined = mergeNew[InlinedBatch, Long](_.newInlined, _.endedInlined,
        _.batchId,
        b => b.copy(begin = rb(b.begin), end = re(b.end),
          schemaVersion = rb(b.schemaVersion)),
        _.copy(end = Some(finalSid)), _.end),
      endedInlined = staged.flatMap(_.endedInlined).distinct.toList,
      newTags = mergeNew[TagEntry, String](_.newTags, _.endedTags,
        t => s"${t.scope}:${t.key}",
        t => t.copy(begin = rb(t.begin), end = re(t.end)),
        _.copy(end = Some(finalSid)), _.end),
      endedTags = staged.flatMap(_.endedTags).distinct.toList,
      newScheduledDeletions = staged.flatMap(_.newScheduledDeletions)
        .map(sd => sd.copy(snapshotId = rb(sd.snapshotId))).toList,
      removedScheduledDeletions =
        staged.flatMap(_.removedScheduledDeletions).distinct.toList,
      expiredSnapshots =
        staged.flatMap(_.expiredSnapshots).filter(_ <= baseSid).distinct.toList)
  }
}
