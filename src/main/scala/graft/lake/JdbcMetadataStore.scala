package graft.lake

import java.sql.{Connection, DriverManager, SQLException}

/** JDBC-backed metadata store (the SURVEY §7.1 "backed by embedded store
  * or JDBC" slot): the commit log and checkpoints live in two tables of a
  * shared relational database, so N engines on one lake share a LIVE
  * catalog — the reference's defining deployment
  * (PgDuckLakeMetadataManager services DuckDB catalog reads/writes over
  * PG SPI, src/pgducklake_metadata_manager.cpp:366-404; the FDW attaches
  * the same live catalog and new snapshots appear on every re-read,
  * src/pgducklake_fdw.cpp:167-190). A writer's commit is visible to every
  * other store instance on its next `state()` read — no freeze → import
  * pull cycle.
  *
  * CAS: INSERT into a `snapshot_id BIGINT PRIMARY KEY` table. A
  * concurrent claim of the same id surfaces as the database's unique-key
  * violation (SQLState 23505 / Derby 23500-family) →
  * [[CommitConflictException]] → commitWithRetry re-reads state and
  * retries — exactly the reference's conflict mechanism (a PG unique-key
  * violation in a subtransaction triggers the DuckLake commit retry,
  * src/pgducklake_metadata_manager.cpp:294-364).
  *
  * Data files stay on `root` (the lake's storage substrate, local or
  * object store via [[StoreIO]]); only metadata rows move through JDBC.
  * Exercised with embedded Derby (already on the Spark classpath — it
  * backs the Hive metastore); any JDBC database with unique-key
  * enforcement works, for PG pass its URL + credentials in the standard
  * JDBC form. The PG dialect half (TEXT DDL, FETCH FIRST probe, 23505
  * CAS incl. a concurrent two-session claim of one slot) is proven
  * against a live PostgreSQL 15 by `scripts/pg_catalog_check.py`, which
  * replays this file's statements verbatim — the JDBC transport itself
  * is proven on Derby (JdbcStoreSpec, CrossProcessSpec) because no
  * pgjdbc jar is resolvable in the offline build environment.
  *
  * Thread safety: one Connection per store instance, every JDBC access
  * under the store monitor (the same monitor `state()` already holds, so
  * fold-then-read stays consistent).
  */
class JdbcMetadataStore(root: String, val url: String)
    extends MetadataStore(root) {

  private val conn: Connection = DriverManager.getConnection(url)
  conn.setAutoCommit(true)

  private def ensureTable(create: String, probe: String): Unit = {
    val st = conn.createStatement()
    try st.executeUpdate(create)
    catch {
      case e: SQLException =>
        // someone else created it first (or it survives from a previous
        // session) — probe; rethrow the original failure if it's not there
        try { val rs = st.executeQuery(probe); rs.close() }
        catch { case _: Exception => st.close(); throw e }
    } finally st.close()
  }
  // unbounded-text DDL type by dialect: PG has no CLOB (TEXT is its
  // unbounded type — the reference's catalog database), MySQL's TEXT caps
  // at 64 KB (a wide commit delta overflows it), Derby and the SQL
  // standard spell it CLOB
  private val textType =
    if (url.startsWith("jdbc:postgresql:")) "TEXT"
    else if (url.startsWith("jdbc:mysql:") || url.startsWith("jdbc:mariadb:")) "LONGTEXT"
    else "CLOB"
  synchronized {
    ensureTable(
      s"CREATE TABLE graft_commit_log (snapshot_id BIGINT PRIMARY KEY, delta $textType NOT NULL)",
      "SELECT snapshot_id FROM graft_commit_log FETCH FIRST 1 ROWS ONLY")
    ensureTable(
      s"CREATE TABLE graft_checkpoint (snapshot_id BIGINT PRIMARY KEY, state $textType NOT NULL)",
      "SELECT snapshot_id FROM graft_checkpoint FETCH FIRST 1 ROWS ONLY")
  }

  private def isDuplicate(e: SQLException): Boolean =
    e.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] ||
      Option(e.getSQLState).exists(_.startsWith("23"))

  private def queryIds(table: String): Vector[Long] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(
        s"SELECT snapshot_id FROM $table ORDER BY snapshot_id")
      val b = Vector.newBuilder[Long]
      while (rs.next()) b += rs.getLong(1)
      rs.close()
      b.result()
    } finally st.close()
  }

  private def queryJson(table: String, col: String, sid: Long): String = {
    val ps = conn.prepareStatement(
      s"SELECT $col FROM $table WHERE snapshot_id = ?")
    try {
      ps.setLong(1, sid)
      val rs = ps.executeQuery()
      if (!rs.next())
        throw new NoSuchElementException(s"$table has no snapshot $sid")
      // getString reads both Derby CLOB and PG/MySQL text types; getClob
      // would pin the code to databases with a true LOB locator API
      val out = rs.getString(1)
      rs.close()
      out
    } finally ps.close()
  }

  private def insertIfAbsent(table: String, sid: Long, json: String): Boolean = {
    val ps = conn.prepareStatement(
      s"INSERT INTO $table (snapshot_id, ${if (table == "graft_commit_log") "delta" else "state"}) VALUES (?, ?)")
    try {
      ps.setLong(1, sid)
      ps.setString(2, json)
      ps.executeUpdate()
      true
    } catch {
      case e: SQLException if isDuplicate(e) => false
    } finally ps.close()
  }

  override protected def listSnapshotIds(): Vector[Long] =
    synchronized { queryIds("graft_commit_log") }

  override protected def listCheckpointIds(): Vector[Long] =
    synchronized { queryIds("graft_checkpoint") }

  override protected def readDeltaJson(sid: Long): String =
    synchronized { queryJson("graft_commit_log", "delta", sid) }

  override protected def readCheckpointJson(sid: Long): String =
    synchronized { queryJson("graft_checkpoint", "state", sid) }

  override protected def putDeltaIfAbsent(sid: Long, json: String): Boolean =
    synchronized { insertIfAbsent("graft_commit_log", sid, json) }

  override protected def putCheckpointIfAbsent(sid: Long, json: String): Unit =
    synchronized { insertIfAbsent("graft_checkpoint", sid, json) }

  override protected def deleteCheckpoint(sid: Long): Unit = synchronized {
    val ps = conn.prepareStatement(
      "DELETE FROM graft_checkpoint WHERE snapshot_id = ?")
    try { ps.setLong(1, sid); ps.executeUpdate() } finally ps.close()
  }

  def close(): Unit = synchronized {
    try conn.close() catch { case _: SQLException => () }
  }
}
