package graft.sources

import graft.SparkSpec
import org.apache.hadoop.fs.Path

/** The resumable whole-warehouse sweep driver (r18 verdict #5):
  * [[ParquetWarehouse.sweepAllTables]] iterates the per-table sweep units
  * with an on-disk progress ledger, so a multi-hour audit aborted at unit
  * k restarts at unit k — not from zero — with the cross-run contract the
  * spec pins: across an abort + resume pair, NO unit is swept twice and
  * NONE is skipped. Same ledger discipline as the cross-process soak
  * (append one line per completed unit, flushed before the next unit
  * starts, so a crash loses at most the in-flight unit). */
class WarehouseSweepResumeSpec extends SparkSpec {

  private def fsFor(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  /** A warehouse root with `n` table dirs, each holding one nested aged
    * lock, plus one aged top-level (unit 0) lock. Returns the root. */
  private def plantWarehouse(tag: String, n: Int): String = {
    val root = java.nio.file.Files.createTempDirectory(tag).toString
    val fs = fsFor(root)
    val old = System.currentTimeMillis() - ParquetWarehouse.LockStaleMs - 120000
    def plant(p: Path): Unit = {
      val out = fs.create(p, false)
      out.write(ParquetWarehouse.lockPayload("gone-host", 1L, "tok-x", old).getBytes("UTF-8"))
      out.close()
      fs.setTimes(p, old, -1)
    }
    plant(new Path(s"$root/top.__lock"))
    for (i <- 1 to n) {
      fs.mkdirs(new Path(s"$root/t$i/part"))
      plant(new Path(s"$root/t$i/part/deep.__lock"))
    }
    root
  }

  test("abort mid-sweep + resume: every unit swept exactly once, none skipped, ledger cleared on completion") {
    val root = plantWarehouse("graft_sweepall", 4)
    val fs = fsFor(root)
    val ledger = java.nio.file.Files.createTempDirectory("graft_sweepall_led")
      .resolve("ledger").toString
    // units sweep in sorted order (unit 0 first, then t1..t4); fault t3's
    // listing BEFORE anything is listed — a root-level fault on that unit,
    // which must abort the whole sweep LOUDLY (a failed unit audit must
    // not read as clean), leaving units 0..t2 ledgered
    val t3 = s"$root/t3"
    val faulty = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def listFiles(p: Path, recursive: Boolean)
          : org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] =
        if (p.toString.endsWith("/t3")) throw new java.io.IOException("injected: t3 listing down")
        else super.listFiles(p, recursive)
    }
    val aborted = intercept[java.io.IOException] {
      ParquetWarehouse.sweepAllTablesOn(faulty, root, ledger, clean = false)
    }
    assert(aborted.getMessage.contains("t3 listing down"))
    val ledgered = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(ledger)), "UTF-8")
      .linesIterator.toSeq
    assert(ledgered.exists(_.endsWith("(top-level files)")) &&
      ledgered.exists(_.endsWith("/t1")) && ledgered.exists(_.endsWith("/t2")),
      s"completed units before the fault must be ledgered, got:\n$ledgered")
    assert(!ledgered.exists(_.endsWith("/t3")) && !ledgered.exists(_.endsWith("/t4")),
      s"the faulted unit and the units after it must NOT be ledgered, got:\n$ledgered")

    // resume with a healthy fs: only t3/t4 are swept; 0..t2 are skipped.
    // (unit keys are the fs-QUALIFIED dir paths — file:/... locally —
    // exactly as sweepUnits lists them and the ledger records them)
    val resumed = ParquetWarehouse.sweepAllTablesOn(fs, root, ledger, clean = false)
    assert(resumed.completed, "all units done after the resume")
    val sweptNow = resumed.swept.map(_._1)
    assert(sweptNow.map(_.split("/").last) === Seq("t3", "t4"),
      s"the resume must sweep exactly the units the abort left, got $sweptNow")
    assert(resumed.skippedCompleted.size === 3 &&
      resumed.skippedCompleted.exists(_.endsWith("(top-level files)")),
      s"previously-completed units are skipped, not re-swept: ${resumed.skippedCompleted}")
    // the resumed units' litter is actually reported (nothing silently lost)
    assert(resumed.swept.forall { case (_, entries) => entries.exists(_.kind == "lock") },
      s"each resumed unit reports its planted lock: ${resumed.swept}")
    // no unit swept twice + none skipped: abort-run ledger ∪ resume-run
    // swept = ALL units, disjointly
    val all = ParquetWarehouse.sweepUnits(spark, root).toSet + s"$root (top-level files)"
    assert((ledgered.toSet ++ sweptNow).size === all.size &&
      ledgered.toSet.intersect(sweptNow.toSet).isEmpty,
      s"abort+resume must partition the unit set: first=$ledgered second=$sweptNow all=$all")
    // completion clears the ledger — the NEXT call is a fresh full audit
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(ledger)),
      "a completed sweep deletes its ledger so the next run audits everything again")
    val fresh = ParquetWarehouse.sweepAllTablesOn(fs, root, ledger, clean = false)
    assert(fresh.completed && fresh.swept.size === 5 && fresh.skippedCompleted.isEmpty,
      s"after completion the next sweep is full again: ${fresh.swept.map(_._1)}")
  }

  test("a TRUNCATED unit is not marked complete and is re-swept on resume") {
    val root = plantWarehouse("graft_sweepall_trunc", 2)
    val fs = fsFor(root)
    // t1 needs a SECOND entry so the wedge (thrown from the fetch after
    // the first served entry) actually truncates the walk — with one file
    // the iterator would simply exhaust and the unit would read complete
    locally {
      val old = System.currentTimeMillis() - ParquetWarehouse.LockStaleMs - 120000
      val extra = new Path(s"$root/t1/part/second.__lock")
      val out = fs.create(extra, false)
      out.write(ParquetWarehouse.lockPayload("gone-host", 1L, "tok-y", old).getBytes("UTF-8"))
      out.close()
      fs.setTimes(extra, old, -1)
    }
    val ledger = java.nio.file.Files.createTempDirectory("graft_sweepall_led2")
      .resolve("ledger").toString
    // t1's walk wedges AFTER its first entry: sweepLocksOn degrades to a
    // best-effort PARTIAL report with the sweep-truncated sentinel — the
    // unit ran, but its audit is incomplete, so ledgering it as done
    // would make the resume read a partial audit as covered
    val wedgy = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def listFiles(p: Path, recursive: Boolean)
          : org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] = {
        val inner = super.listFiles(p, recursive)
        if (!p.toString.endsWith("/t1")) inner
        else new org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] {
          private var served = 0
          def hasNext: Boolean = inner.hasNext
          def next(): org.apache.hadoop.fs.LocatedFileStatus = {
            if (served >= 1) throw new RuntimeException("injected: wedged mid-stream")
            served += 1; inner.next()
          }
        }
      }
    }
    val run = ParquetWarehouse.sweepAllTablesOn(wedgy, root, ledger, clean = false)
    assert(!run.completed, "a run containing a truncated unit is not complete")
    val truncated = run.swept.filter(_._2.exists(_.kind == "sweep-truncated")).map(_._1)
    assert(truncated.map(_.split("/").last) === Seq("t1"),
      s"t1's report carries the sentinel: ${run.swept}")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(ledger)),
      "an incomplete run keeps its ledger")
    val ledgered = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(ledger)), "UTF-8")
    assert(!ledgered.contains("/t1"), s"the truncated unit must NOT be ledgered: $ledgered")
    // resume: t1 is re-swept (now healthy), already-complete units skipped
    val resumed = ParquetWarehouse.sweepAllTablesOn(fs, root, ledger, clean = false)
    assert(resumed.completed && resumed.swept.map(_._1.split("/").last) === Seq("t1"),
      s"the resume re-sweeps exactly the truncated unit: ${resumed.swept.map(_._1)}")
    assert(resumed.swept.head._2.exists(e => e.kind == "lock" && e.judgedDead),
      "the re-sweep recovers the litter the truncation hid")
  }

  test("a torn final ledger line is unit-not-recorded — and can never prefix-poison another unit (r19 verdict #5)") {
    // Ten tables so the warehouse has the poisoning pair: t10's qualified
    // path torn one byte short spells t1's FULL path. A crash between the
    // append's first byte and its newline reaching disk leaves exactly
    // such a line — counting it would mark a never-swept unit complete.
    val root = plantWarehouse("graft_sweepall_torn", 10)
    val fs = fsFor(root)
    val qroot = fs.makeQualified(new Path(root)).toString
    val ledger = java.nio.file.Files.createTempDirectory("graft_sweepall_torn_led")
      .resolve("ledger").toString
    // handcraft an aborted run's ledger: shallow unit complete, then a
    // TORN append of t10's key — its bytes so far spell t1's key, no
    // terminating newline
    java.nio.file.Files.write(java.nio.file.Paths.get(ledger),
      (s"$qroot (top-level files)\n" + s"$qroot/t1").getBytes("UTF-8"))
    val resumed = ParquetWarehouse.sweepAllTablesOn(fs, root, ledger, clean = false)
    assert(resumed.completed)
    assert(resumed.skippedCompleted === Seq(s"$qroot (top-level files)"),
      s"ONLY the newline-terminated line records a unit: ${resumed.skippedCompleted}")
    val sweptNames = resumed.swept.map(_._1.split("/").last)
    assert(sweptNames.contains("t1") && sweptNames.contains("t10"),
      s"t1 must be swept — a torn prefix of t10 must not impersonate its key: $sweptNames")
    assert(resumed.swept.size === 10, s"all ten table units sweep: $sweptNames")
    // each re-swept unit really reports its planted litter (t1 included —
    // the poisoned variant would have skipped it and left its lock unjudged)
    assert(resumed.swept.forall { case (_, entries) => entries.exists(_.kind == "lock") },
      s"every swept unit reports its planted lock: ${resumed.swept.map(_._1)}")
  }

  test("resume under a differently spelled root skips the recorded units (qualified ledger keys, r19 ADVICE)") {
    val root = plantWarehouse("graft_sweepall_spell", 3)
    val fs = fsFor(root)
    val ledger = java.nio.file.Files.createTempDirectory("graft_sweepall_spell_led")
      .resolve("ledger").toString
    // abort at t2 — the run was launched with a TRAILING-SLASH root
    val faulty = new org.apache.hadoop.fs.FilterFileSystem(fs) {
      override def listFiles(p: Path, recursive: Boolean)
          : org.apache.hadoop.fs.RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] =
        if (p.toString.endsWith("/t2")) throw new java.io.IOException("injected: t2 listing down")
        else super.listFiles(p, recursive)
    }
    intercept[java.io.IOException] {
      ParquetWarehouse.sweepAllTablesOn(faulty, root + "/", ledger, clean = false)
    }
    // resume spelled as a file: URI — every recorded unit must still be
    // skipped; before qualification each spelling change re-swept the
    // whole warehouse, silently breaking the exactly-once contract
    val resumed = ParquetWarehouse.sweepAllTablesOn(fs, "file:" + root, ledger, clean = false)
    assert(resumed.completed)
    assert(resumed.skippedCompleted.size === 2 &&
      resumed.skippedCompleted.exists(_.endsWith("(top-level files)")),
      s"the shallow unit and t1 are recorded across spellings: ${resumed.skippedCompleted}")
    assert(resumed.swept.map(_._1.split("/").last) === Seq("t2", "t3"),
      s"the resume sweeps exactly what the abort left: ${resumed.swept.map(_._1)}")
  }
}
