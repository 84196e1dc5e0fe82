package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** The operational lock janitor ([[ParquetWarehouse.sweepLocks]], r16).
  * A crashed fleet strands `.__lock` markers and takeover tombstones
  * across many table paths; ordinary cleanup only happens when a future
  * writer CONTENDS on the same table, so tables nobody writes again keep
  * their litter forever. The janitor lists and judges everything under a
  * root by the writer path's own rules, and with `clean = true` removes
  * only what a writer would itself remove. */
class LockJanitorSpec extends SparkSpec {
  import spark.implicits._

  private def fsFor(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def plant(fs: org.apache.hadoop.fs.FileSystem, p: Path, content: String,
      mtimeAgo: Long = 0L): Path = {
    val out = fs.create(p, false)
    out.write(content.getBytes("UTF-8")); out.close()
    if (mtimeAgo > 0) fs.setTimes(p, System.currentTimeMillis() - mtimeAgo, -1)
    p
  }

  private def deadPid(): Long = {
    val p = new ProcessBuilder("true").start()
    p.waitFor()
    p.pid()
  }

  test("janitor judges litter by the writer's own rules and, report-only, touches nothing") {
    val root = java.nio.file.Files.createTempDirectory("graft_janitor").toString
    val fs = fsFor(root)
    val horizon = ParquetWarehouse.LockStaleMs
    // five pieces of litter across two "tables":
    val deadLock = plant(fs, new Path(root + "/t1.__lock"),
      ParquetWarehouse.lockPayload(ParquetWarehouse.lockHost, deadPid(), "tok-dead"))
    val old = System.currentTimeMillis() - horizon - 60000
    val agedLock = plant(fs, new Path(root + "/t2.__lock"),
      ParquetWarehouse.lockPayload("some-other-host", 1L, "tok-aged", old),
      mtimeAgo = horizon + 60000)
    val liveLock = plant(fs, new Path(root + "/sub/t3.__lock"),
      ParquetWarehouse.lockPayload("some-other-host", 1L, "tok-live"))
    val agedTomb = plant(fs, new Path(root + "/t1.__lock.__tomb-old"),
      s"retired ts=$old\n", mtimeAgo = horizon + 60000)
    val freshTomb = plant(fs, new Path(root + "/t2.__lock.__tomb-new"),
      s"retired ts=${System.currentTimeMillis()}\n")

    val report = ParquetWarehouse.sweepLocks(spark, root)
    assert(report.size === 5, s"all litter listed, got:\n${report.mkString("\n")}")
    def entry(p: Path) = report.find(_.path.endsWith(p.toUri.getPath)).get
    assert(entry(deadLock).judgedDead && entry(deadLock).reason.contains("pid gone"))
    assert(entry(agedLock).judgedDead && entry(agedLock).reason.contains("aged"))
    assert(!entry(liveLock).judgedDead && entry(liveLock).reason.contains("live"))
    assert(entry(agedTomb).judgedDead && entry(agedTomb).kind === "tombstone")
    assert(!entry(freshTomb).judgedDead && entry(freshTomb).kind === "tombstone")
    assert(report.forall(!_.removed), "report-only run must remove nothing")
    Seq(deadLock, agedLock, liveLock, agedTomb, freshTomb).foreach(p =>
      assert(fs.exists(p), s"$p must be untouched by a report-only sweep"))

    // clean = true: dead/aged locks are RETIRED (tomb left on purpose —
    // the straggler guard), aged tombs deleted, live/fresh left alone
    val cleaned = ParquetWarehouse.sweepLocks(spark, root, clean = true)
    def centry(p: Path) = cleaned.find(_.path.endsWith(p.toUri.getPath)).get
    assert(centry(deadLock).removed && !fs.exists(deadLock))
    assert(centry(agedLock).removed && !fs.exists(agedLock))
    assert(!centry(liveLock).removed && fs.exists(liveLock),
      "a live holder's lock must never be touched")
    assert(centry(agedTomb).removed && !fs.exists(agedTomb))
    assert(!centry(freshTomb).removed && fs.exists(freshTomb),
      "a fresh tombstone still guards its takeover's stragglers")
    // each retired lock leaves a FRESH payload-derived tombstone behind
    val t1Tombs = fs.globStatus(new Path(root + "/t1.__lock.__tomb-*"))
    assert(t1Tombs.length === 1, "dead lock retired into exactly one fresh tombstone")
    assert(System.currentTimeMillis() - t1Tombs.head.getModificationTime < 60000,
      "the retire re-stamp makes the janitor's tombstone fresh")

    // second pass a horizon later: the retire tombstones age out too —
    // litter converges to zero in two passes, by design
    for (t <- fs.globStatus(new Path(root + "/*.__lock.__tomb-*"))) {
      val o = fs.create(t.getPath, true)
      o.write(s"retired ts=$old\n".getBytes("UTF-8")); o.close()
      fs.setTimes(t.getPath, old, -1)
    }
    fs.delete(liveLock, false) // the live holder released in the meantime
    val finalPass = ParquetWarehouse.sweepLocks(spark, root, clean = true)
    assert(finalPass.forall(_.removed), s"second pass reaps everything:\n${finalPass.mkString("\n")}")
    assert(ParquetWarehouse.sweepLocks(spark, root).isEmpty, "litter converged to zero")
  }

  test("janitor's retire is the writer takeover: a lock that changed hands between judge and retire is left alone") {
    val root = java.nio.file.Files.createTempDirectory("graft_janitor_race").toString
    val fs = fsFor(root)
    // a lock whose payload CHANGES under the janitor (a new writer took
    // over between listFiles and the clean) — the abandon-if-changed
    // re-read must refuse the retire, exactly like a writer straggler
    val lock = new Path(root + "/t.__lock")
    plant(fs, lock, ParquetWarehouse.lockPayload(
      ParquetWarehouse.lockHost, deadPid(), "tok-x"))
    // plant the dead-payload tombstone FIRST: the janitor's retire then
    // fails the tomb-exists precondition (same straggler-guard rule),
    // proving it serializes on the same primitive rather than deleting
    val payload = ParquetWarehouse.readLockPayload(fs, lock).get
    val tomb = new Path(ParquetWarehouse.tombstoneName(root + "/t", payload))
    plant(fs, tomb, "retired ts=" + System.currentTimeMillis() + "\n")
    val report = ParquetWarehouse.sweepLocks(spark, root, clean = true)
    val lockEntry = report.find(_.kind == "lock").get
    assert(lockEntry.judgedDead, "still judged dead")
    assert(!lockEntry.removed, "but NOT removed — the fresh tomb blocks the retire")
    assert(fs.exists(lock), "the corpse waits for the tomb to age, like any writer race")
  }

  test("janitor retires a dead lock whose payload is UNREADABLE (None == None, like the writer path)") {
    // a corpse whose payload read throws (lost block, truncated object):
    // readLockPayload returns None, and the abandon-if-changed re-read
    // must compare None == None and proceed — the r16 review found the
    // first cut flattening to "" and refusing these corpses forever,
    // while the contended writer path retires them (observed = None)
    val root = java.nio.file.Files.createTempDirectory("graft_janitor_unreadable").toString
    val fs = fsFor(root)
    val horizon = ParquetWarehouse.LockStaleMs
    val lock = plant(fs, new Path(root + "/t.__lock"), "whatever the content was",
      mtimeAgo = horizon + 60000)
    val unreadablePayloads = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def open(p: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream =
        if (p.getName.endsWith(".__lock"))
          throw new java.io.IOException("injected: payload unreadable")
        else super.open(p, bufferSize)
    }
    val report = ParquetWarehouse.sweepLocksOn(unreadablePayloads, root, clean = true)
    val entry = report.find(_.kind == "lock").get
    assert(entry.judgedDead, "unreadable payload + aged mtime = dead by the age rule")
    assert(entry.removed, "the retire must proceed on None == None, not refuse forever")
    assert(!fs.exists(lock), "corpse retired")
    assert(fs.globStatus(new Path(root + "/t.__lock.__tomb-*")).length === 1,
      "retired into the empty-payload tombstone name, like the writer path")
  }

  test("janitor reports litter whose fresh stat transiently fails, flagged, and never removes on the stale basis") {
    // a flaky store timing out one getFileStatus must not silently drop
    // the entry from a report-only audit (the operator would read the
    // table as clean while a stranded lock wedges the next writer) —
    // the entry is reported from the listing snapshot, flagged, and
    // left alone even under clean = true
    val root = java.nio.file.Files.createTempDirectory("graft_janitor_statfail").toString
    val fs = fsFor(root)
    val horizon = ParquetWarehouse.LockStaleMs
    val old = System.currentTimeMillis() - horizon - 60000
    val lock = plant(fs, new Path(root + "/t.__lock"),
      ParquetWarehouse.lockPayload("some-other-host", 1L, "tok-x", old),
      mtimeAgo = horizon + 60000)
    val statFails = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def getFileStatus(p: Path): org.apache.hadoop.fs.FileStatus =
        if (p.getName.endsWith(".__lock"))
          throw new java.io.IOException("injected: transient stat failure")
        else super.getFileStatus(p)
    }
    val report = ParquetWarehouse.sweepLocksOn(statFails, root, clean = true)
    val entry = report.find(_.kind == "lock")
      .getOrElse(fail(s"entry must not be dropped from the report, got:\n${report.mkString("\n")}"))
    assert(!entry.judgedDead,
      "an unverifiable entry claims NO verdict — a stale-snapshot judgedDead would " +
        "let a programmatic consumer delete a live holder's lock")
    assert(entry.reason.contains("unverifiable") && entry.reason.contains("suggest aged"),
      s"flagged with the stale signals as a suggestion only, got: ${entry.reason}")
    assert(!entry.removed && fs.exists(lock),
      "never removed on a stale listing basis, even under clean = true")
    // and a retire whose own I/O throws mid-call downgrades to
    // removed=false WITH the row still reported — never a dropped entry
    val retireThrows = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def exists(p: Path): Boolean =
        if (p.getName.contains(".__tomb-"))
          throw new java.io.IOException("injected: transient exists failure")
        else super.exists(p)
    }
    val report2 = ParquetWarehouse.sweepLocksOn(retireThrows, root, clean = true)
    val entry2 = report2.find(_.kind == "lock")
      .getOrElse(fail(s"entry must not be dropped when the retire throws, got:\n${report2.mkString("\n")}"))
    assert(entry2.judgedDead, "fresh signals: genuinely aged")
    assert(!entry2.removed && fs.exists(lock),
      "a throwing retire downgrades to removed=false, never skips the row")
  }

  test("judged-entry FS calls tolerate RuntimeException too: the row is reported, never dropped") {
    // r17 review: widening only the OUTER entry catch to NonFatal would
    // have let a RuntimeException from the fresh stat / payload read /
    // retire escape the IOException-only inner guards and silently drop
    // a judged row — the invisible-litter failure again, one exception
    // class over. Each inner guard must tolerate NonFatal and downgrade
    // exactly like its IOException twin.
    val root = java.nio.file.Files.createTempDirectory("graft_janitor_rte").toString
    val fs = fsFor(root)
    val horizon = ParquetWarehouse.LockStaleMs
    val old = System.currentTimeMillis() - horizon - 60000
    val lock = plant(fs, new Path(root + "/t.__lock"),
      ParquetWarehouse.lockPayload("some-other-host", 1L, "tok-x", old),
      mtimeAgo = horizon + 60000)
    // fresh stat throws RuntimeException → unverifiable row, not removed
    val statRte = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def getFileStatus(p: Path): org.apache.hadoop.fs.FileStatus =
        if (p.getName.endsWith(".__lock"))
          throw new RuntimeException("injected: permission fork failed")
        else super.getFileStatus(p)
    }
    val r1 = ParquetWarehouse.sweepLocksOn(statRte, root, clean = true)
    val e1 = r1.find(_.kind == "lock").getOrElse(fail(s"row dropped:\n${r1.mkString("\n")}"))
    assert(!e1.judgedDead && e1.reason.contains("unverifiable") && !e1.removed && fs.exists(lock))
    // retire throws RuntimeException → removed=false, row kept
    val retireRte = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def exists(p: Path): Boolean =
        if (p.getName.contains(".__tomb-"))
          throw new RuntimeException("injected: transient exists failure")
        else super.exists(p)
    }
    val r2 = ParquetWarehouse.sweepLocksOn(retireRte, root, clean = true)
    val e2 = r2.find(_.kind == "lock").getOrElse(fail(s"row dropped:\n${r2.mkString("\n")}"))
    assert(e2.judgedDead && !e2.removed && fs.exists(lock),
      "a RuntimeException-throwing retire downgrades to removed=false, never skips the row")
    // payload read throws RuntimeException → judged on mtime alone (aged),
    // row kept; the retire proceeds on None == None like the writer path
    val openRte = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def open(p: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream =
        if (p.getName.endsWith(".__lock"))
          throw new RuntimeException("injected: payload read blew up")
        else super.open(p, bufferSize)
    }
    val r3 = ParquetWarehouse.sweepLocksOn(openRte, root, clean = true)
    val e3 = r3.find(_.kind == "lock").getOrElse(fail(s"row dropped:\n${r3.mkString("\n")}"))
    assert(e3.judgedDead && e3.removed && !fs.exists(lock),
      "an unreadable-payload corpse (RuntimeException shape) still retires like the writer path")
  }

  test("a file vanishing between listing and located-status load (RuntimeException) does not kill the sweep") {
    // the r17 janitor-vs-live-writers soak found this in iteration 2: a
    // writer RELEASING its lock mid-sweep makes the walk iterator's
    // fetch throw — on RawLocal a RuntimeException (permissions loaded
    // by forking `ls`, exit code wrapped), which the IOException-only
    // catch let kill the ENTIRE sweep. The fetch must tolerate NonFatal
    // and continue PAST the vanished entry (the faulting element is
    // consumed), so litter AFTER it is still reported.
    val root = java.nio.file.Files.createTempDirectory("graft_janitor_iterfault").toString
    val fs = fsFor(root)
    val horizon = ParquetWarehouse.LockStaleMs
    val old = System.currentTimeMillis() - horizon - 60000
    // three aged locks; the injected iterator throws on the SECOND, so
    // the third proves the walk continues past the fault
    for (n <- Seq("a", "b", "c"))
      plant(fs, new Path(root + s"/$n.__lock"),
        ParquetWarehouse.lockPayload("some-other-host", 1L, s"tok-$n", old),
        mtimeAgo = horizon + 60000)
    val iterThrowsOnce = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def listFiles(p: Path, recursive: Boolean)
          : org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] = {
        val inner = super.listFiles(p, recursive)
        new org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] {
          private var served = 0
          private var thrown = false
          def hasNext: Boolean = inner.hasNext
          def next(): org.apache.hadoop.fs.LocatedFileStatus = {
            val n = inner.next() // consumed, like RawLocal's stats[i++]
            served += 1
            if (served == 2 && !thrown) {
              thrown = true
              throw new RuntimeException(
                "injected: Error while running command to get file permissions")
            }
            n
          }
        }
      }
    }
    val report = ParquetWarehouse.sweepLocksOn(iterThrowsOnce, root, clean = false)
    assert(report.size === 2,
      s"the walk must continue past the vanished entry, got:\n${report.mkString("\n")}")
    assert(report.forall(_.judgedDead), "the surviving entries are still judged normally")
    // a walk wedged BEFORE anything was listed is a root-level fault in
    // lazy clothing (paged listings defer the first LIST call into the
    // first fetch) — it must fail LOUDLY, not return the clean-warehouse
    // empty report (r17 review, fourth pass)
    val iterAlwaysThrows = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def listFiles(p: Path, recursive: Boolean)
          : org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] =
        new org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] {
          def hasNext: Boolean = true
          def next(): org.apache.hadoop.fs.LocatedFileStatus =
            throw new RuntimeException("injected: wedged iterator")
        }
    }
    intercept[RuntimeException] {
      ParquetWarehouse.sweepLocksOn(iterAlwaysThrows, root, clean = false)
    }
    // but one wedged MID-STREAM (at least one entry listed) degrades to
    // best-effort: the walk ends quietly with what was gathered
    val iterWedgesAfterOne = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def listFiles(p: Path, recursive: Boolean)
          : org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] = {
        val inner = super.listFiles(p, recursive)
        new org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] {
          private var served = 0
          def hasNext: Boolean = inner.hasNext
          def next(): org.apache.hadoop.fs.LocatedFileStatus = {
            if (served >= 1) throw new RuntimeException("injected: wedged mid-stream")
            served += 1; inner.next()
          }
        }
      }
    }
    val partial = ParquetWarehouse.sweepLocksOn(iterWedgesAfterOne, root, clean = false)
    // ... but NOT silently (r18, closing the r17 ADVICE): a partial
    // report indistinguishable from a complete audit would let an
    // operator read "rest of the warehouse is clean" off a truncated
    // walk — the failed-audit-reads-as-clean outcome, bounded edition.
    // The report must end with the sweep-truncated sentinel row.
    val (sentinels, entries) = partial.partition(_.kind == "sweep-truncated")
    assert(entries.size === 1,
      s"a mid-stream wedge ends the walk with what was gathered, got:\n${partial.mkString("\n")}")
    assert(sentinels.size === 1 && !sentinels.head.removed && !sentinels.head.judgedDead,
      s"a truncated walk must surface the truncation as a sentinel row, got:\n${partial.mkString("\n")}")
    // POSITION pin (r18 ADVICE): USAGE.md tells consumers "a report whose
    // LAST row has kind = sweep-truncated ended early" — the sentinel's
    // path is the ROOT, which sorts lexicographically before every child
    // path, so appending it before the sort buried it FIRST and a
    // consumer checking report.last per the docs read a partial audit as
    // complete. The sentinel must be genuinely last.
    assert(partial.last.kind === "sweep-truncated",
      s"the sentinel must be the LAST row of a truncated report, got:\n${partial.mkString("\n")}")
    assert(sentinels.head.reason.contains("PARTIAL") &&
      sentinels.head.reason.contains("wedged mid-stream"),
      "the sentinel names the fault so the operator knows why the audit is partial")
    // a COMPLETE walk over the same root carries no sentinel — the
    // sentinel only ever means "ended early", never noise on a clean run
    assert(ParquetWarehouse.sweepLocksOn(fs, root, clean = false)
      .forall(_.kind != "sweep-truncated"))
  }

  test("janitor sweeping CONCURRENTLY with live writers: mutual exclusion holds and no live lock is ever retired") {
    // r17 verdict directive 3: LockJanitorSpec pinned non-interference in
    // ISOLATION (changed-hands abandon, report-only discipline); this
    // case runs sweepLocks(clean = true) in a tight loop WHILE (a) a
    // long-lived writer holds one table's lock for the whole test, and
    // (b) 8 racers serialize through another table — first by taking
    // over a fabricated dead lock, then through each other's live locks.
    // The invariants a misbehaving janitor would break, both detected
    // within the hold window:
    //   - MUTUAL EXCLUSION: if the janitor ever retired a LIVE lock, a
    //     second writer could stake a fresh one while the first still
    //     runs — the in-critical counter would read 2;
    //   - the long-lived writer's lock is never removed and always
    //     reported "live holder".
    // This test runs under LockSoak (suite list), so the interleaving is
    // soaked N× per soak run — the README records the soak tally.
    val root = java.nio.file.Files.createTempDirectory("graft_janitor_concurrent").toString
    val fs = fsFor(root)
    val liveTable = root + "/t_live"
    val raceTable = root + "/t_race"
    plant(fs, new Path(raceTable + ".__lock"), ParquetWarehouse.lockPayload(
      ParquetWarehouse.lockHost, deadPid(), "tok-corpse"))

    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]

    // (a) the long-lived writer: holds t_live's lock until the test ends
    val liveAcquired = new java.util.concurrent.CountDownLatch(1)
    val liveWriter = new Thread(() => {
      try ParquetWarehouse.withWriterLock(fs, liveTable) {
        liveAcquired.countDown()
        while (!stop.get()) Thread.sleep(5)
      } catch { case t: Throwable => violations.add(s"live writer failed: $t") }
    }, "janitor-soak-live-writer")
    liveWriter.start()
    assert(liveAcquired.await(10, java.util.concurrent.TimeUnit.SECONDS),
      "fixture: the live writer must acquire its lock")

    // (b) the sweeping janitor: full clean loop over the root
    val liveLockName = "t_live.__lock"
    val janitor = new Thread(() => {
      try while (!stop.get()) {
        val report = ParquetWarehouse.sweepLocks(spark, root, clean = true)
        for (e <- report if e.path.endsWith(liveLockName)) {
          if (e.removed) violations.add(s"janitor REMOVED the live writer's lock: $e")
          if (e.judgedDead) violations.add(s"janitor judged the live writer's lock dead: $e")
        }
      } catch { case t: Throwable => violations.add(s"janitor failed: $t") }
    }, "janitor-soak-sweeper")
    janitor.start()

    // (c) 8 racers serialize through t_race under the sweeping janitor;
    // the first acquirer's entry takes over the planted corpse (or finds
    // it already janitor-retired — both are legitimate interleavings)
    val inCritical = new java.util.concurrent.atomic.AtomicInteger(0)
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val racers = (1 to 8).map { i =>
      new Thread(() => {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        var acquired = false
        while (!acquired && System.nanoTime() < deadline) {
          try {
            ParquetWarehouse.withWriterLock(fs, raceTable) {
              val c = inCritical.incrementAndGet()
              if (c != 1) violations.add(s"racer $i saw $c writers in the critical section")
              Thread.sleep(20)
              inCritical.decrementAndGet()
            }
            acquired = true
            done.incrementAndGet()
          } catch {
            case e: IllegalArgumentException if e.getMessage.contains("lock") =>
              Thread.sleep(5) // held by a sibling (or the corpse not yet retired) — retry
            case t: Throwable => violations.add(s"racer $i unexpected: $t"); acquired = true
          }
        }
        if (!acquired) violations.add(s"racer $i never acquired within the deadline")
      }, s"janitor-soak-racer-$i")
    }
    racers.foreach(_.start())
    racers.foreach(_.join(40000))
    stop.set(true)
    janitor.join(20000)
    liveWriter.join(20000)

    assert(violations.isEmpty, s"violations:\n${violations.toArray.mkString("\n")}")
    assert(done.get() === 8, "every racer must eventually serialize through")
    assert(!fs.exists(new Path(liveTable + ".__lock")),
      "the live writer must have released its own lock cleanly at the end")
    assert(!fs.exists(new Path(raceTable + ".__lock")),
      "the last racer must have released cleanly")
  }

  test("janitor on a missing or empty root is a quiet no-op") {
    assert(ParquetWarehouse.sweepLocks(spark, "/tmp/graft-janitor-nonexistent-xyz").isEmpty)
    val root = java.nio.file.Files.createTempDirectory("graft_janitor_empty").toString
    assert(ParquetWarehouse.sweepLocks(spark, root, clean = true).isEmpty)
  }

  test("a ROOT-level fault fails the audit loudly — never the same empty report a clean warehouse returns") {
    // r17 review, third pass: mapping a faulted root to Seq.empty makes
    // a failed audit indistinguishable from "no litter" — the
    // invisible-litter outcome, total instead of partial. Missing root
    // stays quiet (above); a root the store cannot STAT or LIST must
    // throw.
    val root = java.nio.file.Files.createTempDirectory("graft_janitor_rootfault").toString
    val fs = fsFor(root)
    plant(fs, new Path(root + "/t.__lock"), "x")
    val rootStatFaults = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def exists(p: Path): Boolean =
        if (p.toUri.getPath == root) throw new RuntimeException("injected: root stat fault")
        else super.exists(p)
    }
    intercept[RuntimeException] {
      ParquetWarehouse.sweepLocksOn(rootStatFaults, root, clean = false)
    }
    val rootListFaults = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def listFiles(p: Path, recursive: Boolean)
          : org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] =
        if (p.toUri.getPath == root) throw new java.io.IOException("injected: root list fault")
        else super.listFiles(p, recursive)
    }
    intercept[java.io.IOException] {
      ParquetWarehouse.sweepLocksOn(rootListFaults, root, clean = false)
    }
    // a root DELETED between the exists check and a LAZY iterator's
    // first fetch (FNF from hasNext/next, not the constructor) is still
    // the missing-root quiet no-op — but ONLY when the root is
    // VERIFIABLY gone (re-checked): an FNF while the root is alive
    // (a subdirectory vanished before the first yield, litter present)
    // must stay loud, or the failed audit reads as clean
    def lazyFnfIterator(realFs: org.apache.hadoop.fs.FileSystem, staleExistsOnce: Boolean) =
      new org.apache.hadoop.fs.FilterFileSystem(realFs) {
        private var firstExists = staleExistsOnce
        override def exists(p: Path): Boolean =
          if (firstExists) { firstExists = false; true } else super.exists(p)
        override def listFiles(p: Path, recursive: Boolean)
            : org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] =
          new org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] {
            def hasNext: Boolean =
              throw new java.io.FileNotFoundException("injected: vanished before first page")
            def next(): org.apache.hadoop.fs.LocatedFileStatus = throw new IllegalStateException
          }
      }
    // root genuinely gone (deleted on disk; the pre-listing exists check
    // is served a stale true once): quiet no-op
    val goneRoot = java.nio.file.Files.createTempDirectory("graft_janitor_lazygone").toString
    fs.delete(new Path(goneRoot), true)
    assert(ParquetWarehouse.sweepLocksOn(lazyFnfIterator(fs, staleExistsOnce = true),
      goneRoot, clean = false).isEmpty,
      "a lazily-surfaced FNF with the root VERIFIABLY gone is the quiet no-op")
    // root alive with litter: the same lazy FNF must stay LOUD
    intercept[java.io.FileNotFoundException] {
      ParquetWarehouse.sweepLocksOn(lazyFnfIterator(fs, staleExistsOnce = false),
        root, clean = false)
    }
    // third branch: the verifying probe itself FAULTS — unverifiable
    // counts as present, loud, with the probe attached as suppressed so
    // the operator sees the real store error, not a clean "missing"
    val probeFaults = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      private var calls = 0
      override def exists(p: Path): Boolean = {
        calls += 1
        if (calls == 1) true // the pre-listing check
        else throw new RuntimeException("injected: probe fault")
      }
      override def listFiles(p: Path, recursive: Boolean)
          : org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] =
        new org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] {
          def hasNext: Boolean =
            throw new java.io.FileNotFoundException("injected: lazy FNF")
          def next(): org.apache.hadoop.fs.LocatedFileStatus = throw new IllegalStateException
        }
    }
    val loud = intercept[java.io.FileNotFoundException] {
      ParquetWarehouse.sweepLocksOn(probeFaults, root, clean = false)
    }
    assert(loud.getSuppressed.exists(_.getMessage.contains("probe fault")),
      "the faulting probe must ride the rethrow as suppressed — unverifiable, not missing")
  }

  test("per-table sweep covers exactly what the monolithic walk covers, in bounded units (r17 #4)") {
    // the 1M-file cost problem: sweepLocks is one unbounded O(all files)
    // walk. sweepLocksPerTable splits it along the warehouse's
    // first-level structure — unit 0 judges the root's direct child
    // FILES (where every table-sibling lock lives, no recursion), then
    // one bounded recursive unit per first-level dir (litter at any
    // depth). The contract under test: the UNION of the units' reports
    // equals the monolithic report, judgment and clean-actions included.
    val root = java.nio.file.Files.createTempDirectory("graft_janitor_pertable").toString
    val fs = fsFor(root)
    val horizon = ParquetWarehouse.LockStaleMs
    val old = System.currentTimeMillis() - horizon - 60000
    // two "tables" as first-level dirs, with data files
    fs.mkdirs(new Path(root + "/t1/date=2024-01-01"))
    fs.mkdirs(new Path(root + "/t2"))
    plant(fs, new Path(root + "/t1/date=2024-01-01/part-0.parquet"), "PAR1")
    plant(fs, new Path(root + "/t2/part-0.parquet"), "PAR1")
    plant(fs, new Path(root + "/loose.txt"), "not litter")
    // root-level (table-sibling) litter: a dead lock, an aged tombstone, a live lock
    val deadLock = plant(fs, new Path(root + "/t1.__lock"),
      ParquetWarehouse.lockPayload(ParquetWarehouse.lockHost, deadPid(), "tok-dead"))
    val agedTomb = plant(fs, new Path(root + "/t1.__lock.__tomb-old"),
      s"retired ts=$old\n", mtimeAgo = horizon + 60000)
    val liveLock = plant(fs, new Path(root + "/t2.__lock"),
      ParquetWarehouse.lockPayload("some-other-host", 1L, "tok-live"))
    // NESTED litter (partition-grain lock inside a table dir): only the
    // per-dir recursive units can see it — proves unit coverage is not
    // just the shallow pass
    val nestedAged = plant(fs, new Path(root + "/t1/date=2024-01-01.__lock"),
      ParquetWarehouse.lockPayload("some-other-host", 1L, "tok-nested", old),
      mtimeAgo = horizon + 60000)

    assert(ParquetWarehouse.sweepUnits(spark, root).map(new Path(_).getName) ===
      Seq("t1", "t2"), "units are the first-level dirs, sorted")

    def key(e: ParquetWarehouse.LockSweepEntry) = (e.path, e.kind, e.judgedDead, e.reason)
    val mono = ParquetWarehouse.sweepLocks(spark, root)
    val perTable = ParquetWarehouse.sweepLocksPerTable(spark, root)
    assert(perTable.map(_._1).head.endsWith("(top-level files)"))
    val flat = perTable.flatMap(_._2)
    assert(flat.map(key).sorted === mono.map(key).sorted,
      s"per-table union must equal the monolithic report:\nmono=${mono.mkString("\n")}\nper=${flat.mkString("\n")}")
    assert(flat.exists(_.path.endsWith("date=2024-01-01.__lock")),
      "nested litter is covered by its table's recursive unit")
    val shallow = perTable.head._2
    assert(shallow.map(_.path).forall(p => new Path(p).getParent.toUri.getPath == root),
      s"unit 0 judges only the root's direct children, got:\n${shallow.mkString("\n")}")
    assert(shallow.size === 3, "dead lock + aged tomb + live lock at root level")

    // clean=true through the per-table path performs the writer-rule
    // actions the monolithic clean would: dead lock retired (fresh tomb
    // left as the straggler guard), aged tomb deleted, live lock and
    // nested... the nested aged lock is retired by its unit too
    val cleaned = ParquetWarehouse.sweepLocksPerTable(spark, root, clean = true).flatMap(_._2)
    assert(cleaned.count(_.removed) === 3,
      s"dead + aged tomb + nested aged removed, got:\n${cleaned.mkString("\n")}")
    assert(!fs.exists(deadLock) && !fs.exists(agedTomb) && !fs.exists(nestedAged))
    assert(fs.exists(liveLock), "a live holder's lock is never touched")
    assert(fs.globStatus(new Path(root + "/t1.__lock.__tomb-*")).nonEmpty,
      "the retire leaves the fresh straggler-guard tombstone, like the writer path")
  }
}
