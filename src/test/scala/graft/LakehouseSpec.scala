package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Lakehouse

/** Snapshot/ACID table layer (SURVEY §2.22): copy-on-write MERGE at file
  * granularity, manifest-based pruning, atomic snapshot pointer, time
  * travel. The properties below are the ones the graded oracles CANNOT see
  * (oracles check post-state values; these check that the post-state was
  * reached by rewriting only the touched files).
  */
class LakehouseSpec extends AnyFunSuite with SparkFixture {

  private def root = Lakehouse.ensureTable(spark, sf)

  test("COW merge rewrites only batch-overlapping files; the rest carry by reference") {
    val v1 = Lakehouse.manifest(root, 1)
    val v2 = Lakehouse.manifest(root, 2)
    assert(v1.size == 8, s"range layout should yield 8 files, got ${v1.size}")

    val thr = v1.map(_.maxKey).max / 10L
    val untouched = v1.filter(_.minKey > thr).map(_.path).toSet
    val carried = v2.map(_.path).toSet.intersect(v1.map(_.path).toSet)
    // every non-overlapping v1 file appears in v2 BY PATH (no rewrite)...
    assert(untouched.subsetOf(carried))
    // ...and only overlapping files were rewritten: pruning did real work
    assert(untouched.nonEmpty && untouched.size >= v1.size - 2,
      s"expected >=${v1.size - 2} untouched of ${v1.size}, got ${untouched.size}")
    assert(carried == untouched, "a touched file must never be carried by reference")

    // carried files are byte-identical on disk (COW never mutates in place)
    val v1Rows = v1.filter(e => untouched(e.path)).map(e => e.path -> e.rows).toMap
    v2.filter(e => untouched(e.path)).foreach { e =>
      assert(v1Rows(e.path) == e.rows, s"stats drifted for carried file ${e.path}")
    }
  }

  test("time travel: v1 reads the exact pre-merge state after v2 commits") {
    val v1 = Lakehouse.readSnapshot(spark, root, 1)
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"),
        col("o_totalprice"))
    assert(v1.count() == base.count())
    assert(v1.exceptAll(base).isEmpty && base.exceptAll(v1).isEmpty)
  }

  test("v2 holds updates and inserts; unmatched rows are verbatim") {
    val v1 = Lakehouse.manifest(root, 1)
    val thr = v1.map(_.maxKey).max / 10L
    val v2 = Lakehouse.readSnapshot(spark, root, 2)
    val updated = v2.where(col("o_orderkey") <= thr && col("o_orderkey") % 7 === 0)
    val origUpd = Lakehouse.readSnapshot(spark, root, 1)
      .where(col("o_orderkey") <= thr && col("o_orderkey") % 7 === 0)
    // every update key carries exactly +100.0
    val diff = updated.alias("n")
      .join(origUpd.alias("o"), col("n.o_orderkey") === col("o.o_orderkey"))
      .select((col("n.o_totalprice") - col("o.o_totalprice")).as("d"))
      .agg(min("d"), max("d")).collect()(0)
    assert(math.abs(diff.getDouble(0) - 100.0) < 1e-9 &&
      math.abs(diff.getDouble(1) - 100.0) < 1e-9)
    // inserts: one row per key ≡0 mod 11 under thr, shifted +10M
    val nIns = v2.where(col("o_orderkey") >= 10000000L).count()
    val exp = Lakehouse.readSnapshot(spark, root, 1)
      .where(col("o_orderkey") <= thr && col("o_orderkey") % 11 === 0).count()
    assert(nIns == exp && nIns > 0)
  }

  test("commits are atomic and manifests immutable: CURRENT>=2, v1 still readable") {
    val meta = java.nio.file.Paths.get(root, "_meta")
    val cur = new String(java.nio.file.Files.readAllBytes(meta.resolve("CURRENT"))).trim
    assert(cur.toInt >= 2)
    assert(java.nio.file.Files.exists(meta.resolve("v1.manifest")))
    assert(java.nio.file.Files.exists(meta.resolve("v2.manifest")))
    // no torn staging files left behind
    val leftovers = java.nio.file.Files.list(meta).toArray.map(_.toString)
      .filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }

  test("graded ops agree with each other: v2 row count = v1 + inserts") {
    val acid = SparkEntry.queries("warehouse_snapshot_acid")(spark, sf)
      .agg(sum("n_rows"), sum("n_inserted")).collect()(0)
    val tt = SparkEntry.queries("warehouse_time_travel")(spark, sf)
      .agg(sum("n_rows")).collect()(0)
    assert(acid.getLong(0) == tt.getLong(0) + acid.getLong(1))
  }

  test("compaction commits v3 with fewer files and byte-equal content; v2 survives") {
    val r = Lakehouse.ensureCompacted(spark, sf)
    assert(Lakehouse.currentVersion(r).exists(_ >= 3))
    val v2 = Lakehouse.manifest(r, 2)
    val v3 = Lakehouse.manifest(r, 3)
    assert(v3.size == 2 && v3.size < v2.size)
    val a = Lakehouse.readSnapshot(spark, r, 2)
    val b = Lakehouse.readSnapshot(spark, r, 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // pinned readers: every v2 data file still on disk mid/post-compaction
    v2.foreach(e => assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(new java.net.URI(e.path).getPath))))
  }

  test("optimistic concurrency: a commit planned against a stale snapshot is rejected") {
    val r = Lakehouse.ensureCompacted(spark, sf)
    val cur = Lakehouse.currentVersion(r)
    // writer B planned against v1 but the table moved on — CAS must refuse
    assert(!Lakehouse.commitIf(r, Some(1), 99, Lakehouse.manifest(r, 1)))
    assert(Lakehouse.currentVersion(r) == cur)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(r, "_meta", "v99.manifest")))
  }

  test("DELETE prunes to decile-overlapping files and removes exactly the target keys") {
    val r = Lakehouse.ensureDeleted(spark, sf)
    val thr = Lakehouse.manifest(r, 1).map(_.maxKey).max / 10L
    val v3 = Lakehouse.manifest(r, 3)
    val v4 = Lakehouse.manifest(r, 4)
    // the non-overlapping v3 file carries by reference
    val untouched = v3.filter(_.minKey > thr).map(_.path).toSet
    assert(untouched.nonEmpty && untouched.subsetOf(v4.map(_.path).toSet))
    // no surviving target key; non-target rows intact (count reconciliation)
    val v4df = Lakehouse.readSnapshot(spark, r, 4)
    assert(v4df.where(col("o_orderkey") % 13 === 0 && col("o_orderkey") <= thr)
      .count() == 0)
    val v3df = Lakehouse.readSnapshot(spark, r, 3)
    val expected = v3df.where(!(col("o_orderkey") % 13 === 0 && col("o_orderkey") <= thr)).count()
    assert(v4df.count() == expected)
    // pre-delete snapshot still readable (erasure completes via retention)
    assert(v3df.count() > v4df.count())
  }

  test("CDC manifest-diff emits exactly the update+insert rows, typed") {
    val r = root
    val thr = Lakehouse.manifest(r, 1).map(_.maxKey).max / 10L
    val base = Lakehouse.readSnapshot(spark, r, 1)
    val nUpd = base.where(col("o_orderkey") <= thr && col("o_orderkey") % 7 === 0).count()
    val nIns = base.where(col("o_orderkey") <= thr && col("o_orderkey") % 11 === 0).count()
    val ch = SparkEntry.queries("warehouse_snapshot_changes")(spark, sf)
    val byType = ch.groupBy("change_type").count().collect()
      .map(row => row.getString(0) -> row.getLong(1)).toMap
    assert(byType == Map("update" -> nUpd, "insert" -> nIns))
    // every update key is inside the pruned decile
    assert(ch.where(col("change_type") === "update" && col("o_orderkey") > thr).count() == 0)
  }

  test("masked view hides the filtered segment and redacts identity") {
    SparkEntry.queries("warehouse_masked_view")(spark, sf).collect() // defines the view
    val v = spark.table("graft_cust_masked")
    assert(v.where(col("c_mktsegment") === "AUTOMOBILE").count() == 0)
    assert(v.where(!col("c_name_masked").rlike("^Customer#\\*\\*\\*\\d{3}$")).count() == 0)
    // the policy view exposes NO raw name/balance column at all
    assert(!v.columns.contains("c_name") && !v.columns.contains("c_acctbal"))
  }

  test("snapshot expiry vacuums only unreferenced files; kept snapshots intact") {
    val r = Lakehouse.ensureTable(spark, sf, "snap_exp")
    val v1Only = Lakehouse.manifest(r, 1).map(_.path).toSet
      .diff(Lakehouse.manifest(r, 2).map(_.path).toSet)
    assert(v1Only.nonEmpty)
    val before = Lakehouse.readSnapshot(spark, r, 2).count()
    Lakehouse.expireSnapshots(r, keep = Set(2))
    // v1's exclusive files are physically gone, v1's manifest dropped
    v1Only.foreach { p =>
      val lp = java.nio.file.Paths.get(new java.net.URI(p).getPath)
      assert(!java.nio.file.Files.exists(lp), s"expired file survived: $p")
    }
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(r, "_meta", "v1.manifest")))
    // the kept snapshot still reads in full
    assert(Lakehouse.readSnapshot(spark, r, 2).count() == before)
    // the current snapshot is protected
    intercept[IllegalArgumentException] {
      Lakehouse.expireSnapshots(r, keep = Set(1))
    }
  }

  test("read-side skipping scans a strict minority of files, same answer as full scan") {
    val r = root
    val thr = Lakehouse.manifest(r, 1).map(_.maxKey).max / 10L
    val (lo, hi) = (4 * thr, 5 * thr)
    val v2 = Lakehouse.manifest(r, 2)
    val hit = Lakehouse.pruneFiles(r, 2, lo, hi)
    assert(hit.nonEmpty && hit.size * 2 < v2.size,
      s"expected a strict minority of ${v2.size} files, scanned ${hit.size}")
    // stats admit no false negatives: the skipped read ≡ the full-scan read
    val skipped = SparkEntry.queries("warehouse_snapshot_skip")(spark, sf)
    val full = Lakehouse.readSnapshot(spark, r, 2)
      .where(col("o_orderkey") > lo && col("o_orderkey") <= hi)
      .groupBy("o_year")
      .agg(count(lit(1)).as("n_rows"))
    val n = skipped.agg(sum("n_rows")).collect()(0).getLong(0)
    assert(n == full.agg(sum("n_rows")).collect()(0).getLong(0) && n > 0)
  }

  test("conflict: loser's CAS is rejected, rebases onto the winner, neither batch lost") {
    val r = Lakehouse.ensureConflicted(spark, sf)
    assert(Lakehouse.currentVersion(r).contains(4))
    val paths = (v: Int) => Lakehouse.manifest(r, v).map(_.path).toSet
    val aFiles = paths(3).diff(paths(2)) // what writer A added
    val bFiles = paths(4).diff(paths(3)) // what writer B added after rebase
    assert(aFiles.nonEmpty && bFiles.nonEmpty && aFiles.intersect(bFiles).isEmpty)
    // v3 holds A's file and none of B's; v4 holds both — the commit ORDER
    assert(aFiles.subsetOf(paths(4)))
    assert(bFiles.intersect(paths(3)).isEmpty)
    // both writers' rows are in the final table
    val v4 = Lakehouse.readSnapshot(spark, r, 4)
    assert(v4.where(col("o_orderkey") >= 20000000L && col("o_orderkey") < 30000000L).count() > 0)
    assert(v4.where(col("o_orderkey") >= 30000000L).count() > 0)
  }

  test("schema evolution is metadata-only: every v4 file carries into v5 unrewritten") {
    val r = Lakehouse.ensureEvolved(spark, sf)
    val v4 = Lakehouse.manifest(r, 4).map(_.path).toSet
    val v5 = Lakehouse.manifest(r, 5).map(_.path).toSet
    assert(v4.subsetOf(v5), "ADD COLUMN must not rewrite existing files")
    assert((v5 -- v4).size == 1, "exactly the backfill file is new")
    // old rows surface the evolved column as NULL; new rows carry it
    val m = Lakehouse.readSnapshotMerged(spark, r, 5)
    assert(m.columns.contains("o_channel"))
    assert(m.where(col("o_channel").isNull).count() ==
      Lakehouse.readSnapshot(spark, r, 4).count())
    assert(m.where(col("o_channel") === "backfill")
      .where(col("o_orderkey") < 40000000L).count() == 0)
  }

  test("recluster: second-key pruning gains power, content invisible, v2 survives") {
    val r = Lakehouse.ensureReclustered(spark, sf)
    val v3 = Lakehouse.manifest(r, 3)
    // BOTH keys' stats are recorded on the re-sorted files
    assert(v3.forall(e => e.minKey2 != Long.MinValue && e.maxKey2 != Long.MaxValue),
      "recluster commit must carry second-key stats")
    // the new clustering key prunes to a strict minority of files...
    val hit = Lakehouse.pruneFilesByKey2(r, 3, 1997L, 1997L)
    assert(hit.nonEmpty && hit.size < v3.size, s"${hit.size}/${v3.size}")
    // ...and the pruned read misses NOTHING (stats admit no false negatives)
    val prunedCount = spark.read.parquet(hit.map(_.path): _*)
      .where(col("o_year") === 1997).count()
    val fullCount = Lakehouse.readSnapshot(spark, r, 3)
      .where(col("o_year") === 1997).count()
    assert(prunedCount == fullCount && fullCount > 0)
    // pre-recluster v2 files carry unbounded key2 stats: key2 pruning on
    // v2 keeps every file (correct, powerless) — the compat contract
    assert(Lakehouse.pruneFilesByKey2(r, 2, 1997L, 1997L).size ==
      Lakehouse.manifest(r, 2).size)
    // content-invisible: v3 reads v2's exact bytes; v2 stays readable
    def fingerprint(v: Int): (Long, java.math.BigDecimal) = {
      val row = Lakehouse.readSnapshot(spark, r, v)
        .agg(count(lit(1)), sum(col("o_totalprice").cast("decimal(18,4)")))
        .collect()(0)
      (row.getLong(0), row.getDecimal(1))
    }
    assert(fingerprint(3) == fingerprint(2))
  }

  test("rollback: pure metadata commit — v3 references v1's exact files, v2 survives") {
    val r = Lakehouse.ensureRolledBack(spark, sf)
    val v1 = Lakehouse.manifest(r, 1)
    val v3 = Lakehouse.manifest(r, 3)
    // rollback carries v1's manifest verbatim: identical file set AND stats
    assert(v3.toSet == v1.toSet, "rollback must re-reference v1's files byte-for-byte")
    assert(Lakehouse.currentVersion(r).contains(3))
    // no data was written by the rollback: every live file predates it
    // (directories under root are only load-v1 / cow-v2 / ins-v2 / _meta)
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(r))
      .toArray.map(_.toString.split('/').last).toSet
    assert(dirs == Set("load-v1", "cow-v2", "ins-v2", "_meta"),
      s"rollback wrote data: $dirs")
    // the rolled-back "bad" v2 stays readable for forensics
    assert(Lakehouse.readSnapshot(spark, r, 2)
      .where(col("o_orderkey") >= 10000000L).count() > 0)
    // and v3 content equals v1 content
    assert(Lakehouse.readSnapshot(spark, r, 3)
      .exceptAll(Lakehouse.readSnapshot(spark, r, 1)).isEmpty)
  }

  test("branch/tag: dev write invisible to main and the pinned tag, one shared file pool") {
    val r = Lakehouse.ensureBranched(spark, sf)
    // main (CURRENT) never advanced past the fork point
    assert(Lakehouse.currentVersion(r).contains(2), "branch commit must not move main")
    assert(Lakehouse.readRef(r, "dev") == 3)
    assert(Lakehouse.readRef(r, "release") == 2)
    // branch holds the append; main and the tag do not
    val devOnly = (v: Int) => Lakehouse.readSnapshot(spark, r, v)
      .where(col("o_orderkey") >= 50000000L).count()
    assert(devOnly(Lakehouse.readRef(r, "dev")) > 0)
    assert(devOnly(Lakehouse.currentVersion(r).get) == 0)
    assert(devOnly(Lakehouse.readRef(r, "release")) == 0)
    // one shared pool: every main file is referenced by the branch manifest
    val mainFiles = Lakehouse.manifest(r, 2).map(_.path).toSet
    val devFiles = Lakehouse.manifest(r, 3).map(_.path).toSet
    assert(mainFiles.subsetOf(devFiles), "branch must share the fork point's files")
    assert((devFiles -- mainFiles).nonEmpty, "branch head must add its batch file")
  }

  test("expire: disk holds exactly the retained manifests' files afterwards") {
    val r = Lakehouse.ensureExpired(spark, sf)
    val cur = Lakehouse.currentVersion(r).get
    val live = Lakehouse.manifest(r, cur)
      .map(e => Lakehouse.localPath(e.path).toString).toSet
    // VACUUM postcondition: parquet files on disk == live manifest refs —
    // no orphan survived, no live file was lost
    val onDisk = java.nio.file.Files.walk(java.nio.file.Paths.get(r))
      .toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet") && !p.contains("/_meta"))
      .toSet
    assert(onDisk == live, s"orphans=${onDisk -- live} lost=${live -- onDisk}")
    // the expired version's manifest is gone; the retained snapshot reads
    // the exact post-state (same content as the untouched acid table's v2)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(r, "_meta", "v1.manifest")))
    val acid = Lakehouse.ensureTable(spark, sf)
    assert(Lakehouse.readSnapshot(spark, r, cur)
      .exceptAll(Lakehouse.readSnapshot(spark, acid, 2)).isEmpty)
  }

  test("cdc_apply: incremental MV equals the full recompute over v2") {
    val full = SparkEntry.queries("warehouse_cdc_apply")(spark, sf)
    val root = Lakehouse.ensureTable(spark, sf)
    val recompute = Lakehouse.readSnapshot(spark, root, 2)
      .groupBy("o_year")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total"))
    assert(full.exceptAll(recompute).isEmpty &&
      recompute.exceptAll(full).isEmpty)
  }

  test("zorder: custkey stats gain power the linear layout lacks; content invariant") {
    val r = Lakehouse.ensureZordered(spark, sf)
    val v1 = Lakehouse.manifest(r, 1)
    val v2 = Lakehouse.manifest(r, 2)
    val thr2 = v2.map(_.maxKey2).max / 10L
    val (lo2, hi2) = (4 * thr2, 5 * thr2)
    def hits(m: Seq[Lakehouse.FileEntry]) =
      m.count(e => e.minKey2 <= hi2 && e.maxKey2 > lo2)
    // v1 is sorted on o_orderkey: every file spans ~the full custkey range,
    // so custkey stats prune nothing (or nearly nothing)
    assert(hits(v1) * 2 > v1.size,
      s"linear layout should be unprunable on custkey: ${hits(v1)} of ${v1.size}")
    // the z-ordered layout prunes the same predicate to a strict minority
    assert(hits(v2) * 2 < v2.size,
      s"z-order should prune custkey: ${hits(v2)} of ${v2.size}")
    // and the FIRST key keeps skipping power too (compact z-regions bound
    // both dimensions): a 10%-band orderkey predicate skips at least one file
    val thr1 = v2.map(_.maxKey).max / 10L
    val hit1 = v2.count(e => e.minKey <= 5 * thr1 && e.maxKey > 4 * thr1)
    assert(hit1 < v2.size, s"orderkey skipping lost: $hit1 of ${v2.size}")
    // content invariance
    assert(Lakehouse.readSnapshot(spark, r, 2)
      .exceptAll(Lakehouse.readSnapshot(spark, r, 1)).isEmpty)
  }

  test("streaming sink is exactly-once: a replayed micro-batch is a no-op") {
    val r = Lakehouse.ensureStreamTable(spark, sf)
    val cur = Lakehouse.currentVersion(r).get
    assert(cur >= 2, "maxFilesPerTrigger=2 over 4 files must yield >=2 commits")
    val ledger = Lakehouse.manifestBatches(r, cur)
    assert(ledger.size == cur, s"one batch per commit: $ledger vs $cur")
    val before = Lakehouse.readSnapshot(spark, r, cur).count()
    // crash-replay of an already-committed batch id (at-least-once upstream)
    val replay = Lakehouse.readSnapshot(spark, r, cur).limit(5)
    Lakehouse.appendBatch(spark, r, "event_id", ledger.head, replay)
    assert(Lakehouse.currentVersion(r).contains(cur), "replay must not commit")
    assert(Lakehouse.readSnapshot(spark, r, cur).count() == before)
    // and the streamed table equals the batch aggregate (the graded claim)
    val streamed = SparkEntry.queries("stream_lakehouse_sink")(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(streamed == Tables.events(spark, sf).count())
  }

  test("bloom index: driver hash parity with the build, no false negatives, real pruning") {
    // driver-side bloomPositions must equal the Spark-SQL build hash for
    // any key — the sidecar is useless (or worse, wrong) otherwise
    val keys = Seq(1L, 42L, 777L, 123456789L)
    val fromSpark = spark.sql(keys.map { k =>
      (0 until 4).map(j =>
        s"CAST(conv(substring(md5(concat('$j:', CAST($k AS STRING))), 1, 15), 16, 10) AS BIGINT) % 65536")
        .mkString("SELECT array(", ", ", ")")
    }.mkString(" UNION ALL ")).collect().map(_.getSeq[Long](0).map(_.toInt))
    keys.zip(fromSpark).foreach { case (k, expect) =>
      assert(Lakehouse.bloomPositions(k) == expect, s"hash drift for key $k")
    }
    val r = Lakehouse.ensureBloomTable(spark, sf)
    val live = Lakehouse.manifest(r, 2)
    // no false negatives: EVERY custkey's pruned file set covers all the
    // files that actually hold it (checked for a sample of 20 keys)
    val fileOf = spark.read.parquet(live.map(_.path): _*)
      .select(col("o_custkey"), org.apache.spark.sql.functions.input_file_name().as("f"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    fileOf.keys.toSeq.sorted.take(20).foreach { k =>
      val kept = Lakehouse.bloomPruneFiles(r, 2, k).map(_.path).toSet
      assert(fileOf(k).subsetOf(kept), s"false negative for custkey $k")
      // and pruning does real work for a point lookup
      assert(kept.size < live.size, s"no pruning for custkey $k")
    }
  }

  test("deletion vector: v3 rewrites ZERO files; MOR read drops exactly the DV'd rows") {
    val r = Lakehouse.ensureDvTable(spark, sf)
    val v2 = Lakehouse.manifest(r, 2)
    val v3 = Lakehouse.manifest(r, 3)
    // pure metadata commit: identical file list, identical on-disk bytes
    assert(v2.map(_.path).toSet == v3.map(_.path).toSet, "DV delete must not touch data files")
    v3.foreach { e =>
      assert(java.nio.file.Files.size(Lakehouse.localPath(e.path)) > 0)
    }
    val plain = Lakehouse.readSnapshot(spark, r, 3)
    val mor = Lakehouse.readSnapshotMor(spark, r, 3)
    val doomed = plain.where(col("o_orderkey") % 17 === 0).count()
    assert(doomed > 0, "fixture must actually delete something")
    assert(mor.count() == plain.count() - doomed)
    assert(mor.where(col("o_orderkey") % 17 === 0).count() == 0)
    // snapshot isolation: v2 (same files, no sidecar) still reads pre-delete
    assert(Lakehouse.readSnapshotMor(spark, r, 2).count() == plain.count())
  }

  test("DV purge rewrites only sidecar-named files and is invisible to queries") {
    val r = Lakehouse.ensureDvPurged(spark, sf)
    val dvFiles = Lakehouse.readDvEntries(r, 3)
      .map(e => Lakehouse.localPath(e._1).toString).toSet
    assert(dvFiles.nonEmpty)
    val v3 = Lakehouse.manifest(r, 3).map(e => Lakehouse.localPath(e.path).toString).toSet
    val v4 = Lakehouse.manifest(r, 4).map(e => Lakehouse.localPath(e.path).toString).toSet
    // clean files carry by reference; DV'd files are replaced
    assert((v3 -- dvFiles).subsetOf(v4), "clean files must carry by reference")
    assert(v4.intersect(dvFiles).isEmpty, "purged files must leave the manifest")
    // v4 has no sidecar, and reads exactly v3's MOR content
    assert(Lakehouse.readDvEntries(r, 4).isEmpty)
    val a = Lakehouse.readSnapshotMor(spark, r, 3)
    val b = Lakehouse.readSnapshotMor(spark, r, 4)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("shallow clone: zero-copy fork, diverges on its own chain, source untouched") {
    val srcCountBefore = Lakehouse.readSnapshot(spark, root, 2).count()
    val r = Lakehouse.ensureCloned(spark, sf)
    // v1 of the clone references the source's exact live files — no copies
    val srcV2 = Lakehouse.manifest(root, 2).map(_.path).toSet
    val cloneV1 = Lakehouse.manifest(r, 1).map(_.path).toSet
    assert(cloneV1 == srcV2, "clone v1 must reference the source's files verbatim")
    // divergence stayed on the clone: exactly one new file, source history intact
    val cloneV2 = Lakehouse.manifest(r, 2).map(_.path).toSet
    assert((cloneV2 -- cloneV1).size == 1)
    assert(Lakehouse.currentVersion(root).contains(2) ||
      Lakehouse.currentVersion(root).exists(_ >= 2), "source chain unaffected")
    assert(Lakehouse.readSnapshot(spark, root, 2).count() == srcCountBefore)
    // the clone's appended rows never appear through the source's manifest
    assert(Lakehouse.readSnapshot(spark, root, 2)
      .where(col("o_orderkey") >= 90000000L).count() == 0)
  }

  test("partition-spec evolution: old-spec files never pruned, new-spec files prune tight") {
    val r = Lakehouse.ensureSpecEvolved(spark, sf)
    val v1 = Lakehouse.manifest(r, 1).map(_.path).toSet
    val v2 = Lakehouse.manifest(r, 2)
    assert(v1.subsetOf(v2.map(_.path).toSet), "spec change must not rewrite old files")
    val hit = Lakehouse.pruneFilesByKey2(r, 2, 1995L, 1995L)
    // every spec-1 file is kept (no stats ⇒ no false negatives possible)...
    assert(v1.subsetOf(hit.map(_.path).toSet))
    // ...and at least one spec-2 file is actually pruned by its year stats
    val spec2 = v2.map(_.path).toSet -- v1
    assert(spec2.nonEmpty)
    assert(hit.map(_.path).toSet.intersect(spec2).size < spec2.size,
      s"year pruning did no work: kept all ${spec2.size} spec-2 files")
    // pruned read == full read under the residual predicate
    val full = Lakehouse.readSnapshot(spark, r, 2).where(col("o_year") === 1995).count()
    val pruned = spark.read.parquet(hit.map(_.path).toSeq: _*)
      .where(col("o_year") === 1995).count()
    assert(pruned == full && full > 0)
  }
}
