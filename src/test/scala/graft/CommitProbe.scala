package graft

import java.nio.file.{Files, Paths}
import graft.lake.{MetadataStore, CommitConflictException}
import graft.lake.Meta.{CommitDelta, Snapshot}

/** Forked-JVM half of [[CrossProcessSpec]]: a SECOND OS process committing
  * through the same file-log [[MetadataStore]] as the parent test JVM. The
  * O_CREAT|O_EXCL link CAS is a kernel-level primitive, so its exclusion
  * guarantee holds across processes (and across NFS-grade shared mounts) —
  * unlike a JVM-level lock, which single-process threaded specs can't
  * distinguish from. Mirrors the reference's deployment of N independent
  * PG backends racing commits into one catalog
  * (src/pgducklake_metadata_manager.cpp:294-364 subtransaction retry).
  *
  * Protocol: write `<go>.ready` once the store is open, then spin until
  * `<go>` appears (the parent creates it when both sides are ready), then
  * fire `n` commits tagged `<tag>-i` and print PROBE_OK with the claimed
  * snapshot ids.
  */
object CommitProbe {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val n = args(1).toInt
    val tag = args(2)
    val go = Paths.get(args(3))

    val store = new MetadataStore(root)
    Files.write(Paths.get(args(3) + ".ready"), Array.emptyByteArray)
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (!Files.exists(go)) {
      if (System.nanoTime() > deadline) { System.err.println("no go signal"); sys.exit(2) }
      Thread.sleep(5)
    }

    // symmetric pacing: before commit i, at least i-1 PARENT commits must
    // be in the log. Without this, a parent JVM stalled by suite load lets
    // the child burst all n commits into one window and the spec's
    // interleaving assertion flakes — the same pacing the parent applies
    // on child progress, mirrored (observed once under a fully loaded
    // 32-thread test run).
    def parentCommits(): Int = store.state().snapshots
      .count(_.commitMessage.exists(m => !m.startsWith(s"$tag-")))
    val claimed = (0 until n).map { i =>
      val waitDeadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (parentCommits() < i - 1) {
        if (System.nanoTime() > waitDeadline) {
          System.err.println(s"parent stalled before child commit $i"); sys.exit(3)
        }
        Thread.sleep(2)
      }
      store.commitWithRetry(maxRetries = 1000) { (st, sid) =>
        CommitDelta(Snapshot(sid, System.currentTimeMillis(), 0L,
          List(s"probe:$tag-$i"), commitMessage = Some(s"$tag-$i")))
      }
    }
    println(s"PROBE_OK ${claimed.mkString(",")}")
  }
}
