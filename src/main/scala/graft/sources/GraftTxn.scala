package graft.sources

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.internal.SQLConf

/** Session-scoped multi-statement TRANSACTIONS over graft tables (S45):
  *
  * {{{
  *   CALL cat.sys.begin_txn(tables => 'fact,summary')
  *   INSERT INTO cat.fact ...        -- staged, invisible to other sessions
  *   MERGE INTO cat.summary ...      -- same
  *   SELECT ... FROM cat.fact ...    -- sees the txn's own writes
  *   CALL cat.sys.commit_txn()       -- atomic ALL-or-NONE publish
  *   -- or CALL cat.sys.rollback_txn()
  * }}}
  *
  * Mechanics: `begin_txn` forks a hidden branch (`txn-<id>`) on every
  * ENROLLED table and records the txn in the SESSION conf; while active,
  * the catalog routes every plain-name access of an enrolled table —
  * reads, writes, `$changes`/`$versions` metadata, time travel — to that
  * branch. That buys, with zero new commit machinery:
  *
  *   - read-your-writes inside the txn (the branch head),
  *   - repeatable reads (a table the txn never writes stays pinned at
  *     its fork snapshot for the whole txn),
  *   - invisibility to every other session (branches publish nothing),
  *   - atomic commit: `commit_txn` = [[GraftStore.publishGroup]] over the
  *     members the txn actually WROTE — one decision file, all pointers
  *     flip or none, a crashed commit rolls forward or aborts exactly as
  *     S44 proved — and
  *   - first-committer-wins conflict detection: main moved off a written
  *     member's fork → the WHOLE commit refuses loudly and the txn stays
  *     intact (CALL rebase_branch the members, retry, or roll back).
  *
  * Members the txn only READ are dropped from the publish set at commit
  * (their branch carries no commits, there is nothing to publish), so a
  * concurrent writer advancing a read-only member never aborts the txn:
  * write-set OCC over snapshot reads — the same isolation level the
  * big warehouses ship for multi-statement transactions.
  *
  * Loud edges (all spec-pinned): a write to a NON-enrolled graft table
  * inside a txn is rejected at planning — a silently non-transactional
  * write is the one unforgivable failure mode here; ALTER/DROP/RENAME of
  * an enrolled table inside the txn are rejected (DDL is not
  * transactional); nested begin_txn is rejected; the transparent MV
  * rewrite never fires over txn-routed relations (the MV state reflects
  * MAIN while the txn must see branch reality — the rewrite's
  * dir-equality match makes this structural: a branch-routed relation
  * can never equal the body's main-bound one).
  *
  * Scale: `begin_txn` costs one hard-link clone per enrolled table
  * (O(live files) metadata, zero data bytes — the same lever as S40
  * branches); enrollment is EXPLICIT precisely so that cost is declared
  * up front instead of auto-forked on every table a query happens to
  * touch. Everything else is the branch DML the store already runs.
  */
object GraftTxn {

  private def nameKey(cat: String) = s"spark.graft.txn.$cat.name"
  private def tablesKey(cat: String) = s"spark.graft.txn.$cat.tables"
  private def spKey(cat: String) = s"spark.graft.txn.$cat.savepoints"

  /** The hidden branch a txn stages on (one per enrolled table). */
  def branchOf(txn: String): String = s"txn-$txn"

  /** The session's active txn for catalog `cat`: (txn id, enrolled dotted
    * table names). Conf-backed so it is strictly SESSION state — other
    * sessions (including a stream's cloned session) never observe it;
    * callers on threads with no active session get None. */
  def active(cat: String): Option[(String, Seq[String])] =
    try {
      val conf = SQLConf.get
      val n = conf.getConfString(nameKey(cat), "")
      if (n.isEmpty) None
      else Some((n, conf.getConfString(tablesKey(cat), "")
        .split(",").toSeq.map(_.trim).filter(_.nonEmpty)))
    } catch { case NonFatal(_) => None }

  /** Branch to route `dotted`'s plain-name access to under the active
    * txn, if enrolled. MV maintenance resolution is EXEMPT: a body
    * analyzed or recomputed mid-txn must bind to MAIN — the state is
    * main's, and routing it to a branch would fold branch rows into a
    * main-published view. */
  def routedBranch(cat: String, dotted: String): Option[String] =
    if (GraftMaterializedViews.inMaintenance.value) None
    else active(cat) match {
      case Some((txn, tables)) if tables.contains(dotted) =>
        Some(branchOf(txn))
      case _ => None
    }

  def isEnrolled(cat: String, dotted: String): Boolean =
    active(cat).exists(_._2.contains(dotted))

  /** Planning-time write block for a non-enrolled graft table while the
    * session has an active txn (None = writable). MV maintenance is
    * exempt — refresh writes the state table mid-txn legitimately. */
  def writeBlock(cat: String, dotted: String): Option[String] =
    if (GraftMaterializedViews.inMaintenance.value) None
    else active(cat) match {
      case Some((txn, tables)) if !tables.contains(dotted) =>
        Some(s"table $dotted is not enrolled in this session's active " +
          s"transaction '$txn' (enrolled: ${tables.mkString(", ")}) — a " +
          "write here would NOT be transactional; enroll it at " +
          "begin_txn, commit/rollback first, or address a branch " +
          "explicitly")
      case _ => None
    }

  /** Start a txn: fork the hidden branch on every member (all-or-none —
    * a mid-begin failure drops the branches already created), then
    * record the txn in the session conf. Returns the txn id. */
  def begin(spark: SparkSession, cat: String,
      members: Seq[(String, String)], name: Option[String]): String = {
    require(members.nonEmpty, "begin_txn needs at least one table")
    require(members.map(_._1).distinct.size == members.size,
      "begin_txn lists a table twice")
    active(cat).foreach { case (txn, _) =>
      throw new IllegalStateException(
        s"transaction '$txn' is already active in this session for " +
          s"catalog $cat — commit_txn or rollback_txn first " +
          "(transactions do not nest)")
    }
    members.foreach { case (t, _) => require(!t.contains(","),
      s"illegal table name in begin_txn: $t") }
    val txn = name.filter(_.nonEmpty).getOrElse(
      "s" + java.util.UUID.randomUUID().toString.replace("-", "").take(12))
    val branch = branchOf(txn)
    val created = scala.collection.mutable.ArrayBuffer.empty[String]
    try members.foreach { case (t, d) =>
      require(GraftStore.exists(d), s"no such graft table: $t")
      GraftStore.createBranch(d, branch)
      created += d
    } catch {
      case e: Throwable =>
        created.foreach(d =>
          try GraftStore.dropBranch(d, branch)
          catch { case NonFatal(_) => () })
        throw e
    }
    spark.conf.set(nameKey(cat), txn)
    spark.conf.set(tablesKey(cat), members.map(_._1).mkString(","))
    txn
  }

  /** Commit: publish the WRITTEN members' branches as one table group
    * (all pointers flip or none), release the read-only members'
    * untouched branches, clear the session state. On a publish conflict
    * the txn STAYS ACTIVE — every branch intact — so the caller can
    * rebase and retry, or roll back.
    *
    * `retry = true` is the warehouse OCC retry: a fork conflict on a
    * written member (main advanced since begin_txn) auto-rebases that
    * member's branch and re-runs the publish, up to 3 attempts. The
    * rebase carries [[GraftStore.rebaseBranch]]'s LOGICAL conflict
    * check wholesale — merge keys changed on both sides since the fork
    * still refuse LOUDLY with every branch intact (overlapping-key
    * divergence needs a human; disjoint-key and keyless divergence
    * commute and publish both sides). The retry never weakens isolation:
    * each rebase replays the txn's own committed changelog onto a clone
    * of main's NEW head, so what publishes is exactly main ⊎ the txn's
    * statements — first-committer-wins becomes first-committer-ORDERS.
    * Savepoints taken before an auto-rebase die with the fork base (the
    * existing fence), which is moot here: commit clears them on success
    * and a refused commit leaves them refusing loudly as before.
    *
    * Returns (written, readOnly). */
  def commit(spark: SparkSession, cat: String,
      resolve: String => String,
      groupsRoot: java.nio.file.Path,
      retry: Boolean = false): (Long, Long) = {
    val (txn, tables) = active(cat).getOrElse(throw new IllegalStateException(
      s"no transaction is active in this session for catalog $cat — " +
        "CALL begin_txn first"))
    val branch = branchOf(txn)
    val members = tables.map(t => (t, resolve(t)))
    members.foreach { case (t, d) =>
      require(GraftStore.exists(d),
        s"transaction '$txn' lost its table $t — rollback_txn")
      require(GraftStore.branchExists(d, branch),
        s"transaction '$txn' lost its branch on $t (concurrent " +
          "drop_branch?) — the txn can no longer commit; rollback_txn")
    }
    val (written, readOnly) = members.partition { case (_, d) =>
      GraftStore.currentVersion(GraftStore.branchDir(d, branch)) >
        GraftStore.branchForkBase(d, branch)
    }
    if (written.nonEmpty) {
      val maxAttempts = if (retry) 3 else 1
      var attempt = 1
      var published = false
      while (!published) {
        try {
          GraftStore.publishGroup(groupsRoot,
            written.map { case (_, d) => (d, branch) })
          published = true
        } catch {
          case e: java.util.ConcurrentModificationException
              if attempt < maxAttempts =>
            attempt += 1
            // rebase every written member whose main moved off the
            // fork; a logical (overlapping-key) conflict throws from
            // rebaseBranch and surfaces with the txn intact. Members
            // still at their fork are left alone — the CME may have
            // been a transient (another group's marker, a recovery
            // abort), which the bare re-run resolves.
            written.foreach { case (_, d) =>
              if (GraftStore.currentVersion(d) !=
                  GraftStore.branchForkBase(d, branch))
                GraftStore.rebaseBranch(spark, d, branch)
            }
        }
      }
    }
    // only after the publish decided COMMIT: untouched branches release
    // and the session leaves the txn (a throw above keeps it active)
    readOnly.foreach { case (_, d) =>
      try GraftStore.dropBranch(d, branch)
      catch { case NonFatal(_) => () }
    }
    clear(spark, cat)
    (written.size.toLong, readOnly.size.toLong)
  }

  /** Abort: drop every member's txn branch (main untouched — nothing was
    * ever published), clear the session state. Returns branches dropped. */
  def rollback(spark: SparkSession, cat: String,
      resolve: String => String): Long = {
    val (txn, tables) = active(cat).getOrElse(throw new IllegalStateException(
      s"no transaction is active in this session for catalog $cat"))
    val branch = branchOf(txn)
    var dropped = 0L
    tables.foreach { t =>
      val d = resolve(t)
      if (GraftStore.exists(d) && GraftStore.branchExists(d, branch))
        try { GraftStore.dropBranch(d, branch); dropped += 1 }
        catch { case NonFatal(_) => () }
    }
    clear(spark, cat)
    dropped
  }

  private def clear(spark: SparkSession, cat: String): Unit = {
    spark.conf.unset(nameKey(cat))
    spark.conf.unset(tablesKey(cat))
    spark.conf.unset(spKey(cat))
  }

  /** Ordered savepoints of the active txn: name -> per-member
    * (branch head, fork base) at creation, member order = the enrolled
    * list's. Conf-encoded (`n=v:f|v:f;n2=...`) so savepoints share the
    * txn's session-scoped lifecycle for free. */
  private def savepoints(cat: String): Seq[(String, Seq[(Long, Long)])] =
    try SQLConf.get.getConfString(spKey(cat), "").split(";").toSeq
      .filter(_.nonEmpty).map { s =>
        val Array(n, vs) = s.split("=", 2)
        n -> vs.split("\\|").toSeq.filter(_.nonEmpty).map { p =>
          val Array(v, f) = p.split(":", 2)
          (v.toLong, f.toLong)
        }
      }
    catch { case NonFatal(_) => Nil }

  private def writeSavepoints(spark: SparkSession, cat: String,
      sps: Seq[(String, Seq[(Long, Long)])]): Unit =
    if (sps.isEmpty) spark.conf.unset(spKey(cat))
    else spark.conf.set(spKey(cat), sps.map { case (n, ms) =>
      s"$n=${ms.map { case (v, f) => s"$v:$f" }.mkString("|")}"
    }.mkString(";"))

  /** `CALL savepoint(name)`: record every member branch's head (and its
    * fork base, the rebase fence below) so a later
    * [[rollbackToSavepoint]] can undo just the statements after it.
    * Metadata-only — two version-file reads per member, no commit. */
  def savepoint(spark: SparkSession, cat: String,
      resolve: String => String, name: String): Long = {
    val (txn, tables) = active(cat).getOrElse(throw new IllegalStateException(
      s"no transaction is active in this session for catalog $cat — " +
        "savepoints only exist inside begin_txn"))
    require(name.matches("[A-Za-z][A-Za-z0-9_.-]*"),
      s"invalid savepoint name '$name'")
    val sps = savepoints(cat)
    require(!sps.exists(_._1 == name),
      s"savepoint '$name' already exists in transaction '$txn'")
    val branch = branchOf(txn)
    val marks = tables.map { t =>
      val d = resolve(t)
      require(GraftStore.branchExists(d, branch),
        s"transaction '$txn' lost its branch on $t — rollback_txn")
      (GraftStore.currentVersion(GraftStore.branchDir(d, branch)),
        GraftStore.branchForkBase(d, branch))
    }
    writeSavepoints(spark, cat, sps :+ (name -> marks))
    marks.size.toLong
  }

  /** `CALL rollback_to_savepoint(name)`: restore every member branch
    * written since the savepoint back to its recorded head — a standard
    * per-branch RESTORE commit (hard links, history preserved), so the
    * rolled-back statements simply stop being part of what commit_txn
    * publishes. The target savepoint survives for reuse; savepoints
    * established AFTER it are destroyed (SQL semantics). Loud edges: a
    * member whose fork base changed since the savepoint was taken means
    * the branch was REBASED (rebase_branch replays commits under new
    * numbers — the recorded head no longer names the savepoint's state):
    * the whole rollback refuses and the txn stays intact — take new
    * savepoints after a rebase. CDC cost, stated plainly: RESTORE is a
    * snapshot boundary, so a member restored here publishes that
    * boundary at commit_txn and its changelog consumers re-snapshot
    * across it — correctness is never at stake (the boundary is exactly
    * the "do not fold past this" signal), but a downstream incremental
    * MV on that member takes the full-recompute lane once. */
  def rollbackToSavepoint(spark: SparkSession, cat: String,
      resolve: String => String, name: String): Long = {
    val (txn, tables) = active(cat).getOrElse(throw new IllegalStateException(
      s"no transaction is active in this session for catalog $cat"))
    val sps = savepoints(cat)
    val idx = sps.indexWhere(_._1 == name)
    require(idx >= 0, s"transaction '$txn' has no savepoint '$name' " +
      s"(have ${sps.map(_._1).mkString("[", ", ", "]")})")
    val branch = branchOf(txn)
    val members = tables.zip(sps(idx)._2).map { case (t, (v, f)) =>
      val d = resolve(t)
      require(GraftStore.branchExists(d, branch),
        s"transaction '$txn' lost its branch on $t — rollback_txn")
      require(GraftStore.branchForkBase(d, branch) == f,
        s"savepoint '$name' predates a rebase_branch of $t's txn branch " +
          "— replayed commits are renumbered, the savepoint no longer " +
          "names a restorable state; take new savepoints after rebasing")
      (d, v)
    }
    // validate everything BEFORE restoring anything: the rollback is
    // per-member sequential, so refuse-all-or-restore-all up front
    var restored = 0L
    val remarked = members.map { case (d, v) =>
      val bd = GraftStore.branchDir(d, branch)
      val head = if (GraftStore.currentVersion(bd) > v) {
        restored += 1
        GraftStore.restore(bd, v) // the new head; content == the mark's
      } else v
      (head, GraftStore.branchForkBase(d, branch))
    }
    // the savepoint survives for reuse but re-marks at the restore
    // commits (same content, newer numbers) so a repeat rollback_to is
    // a no-op instead of stacking another restore each time
    writeSavepoints(spark, cat,
      sps.take(idx) :+ (name -> remarked))
    restored
  }
}
