package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, concat, expr, lit}
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.SparkSpec

/** Seeded randomized DIFFERENTIAL lifecycle: a pseudo-random sequence
  * of table operations — appends, CoW and DV deletes/updates, merges,
  * compaction, z-order, DV purge, column rename, type widening,
  * restore — executed against one table while a driver-side reference
  * model tracks the exact expected row set. After EVERY commit the
  * table must equal the model, and random earlier versions must
  * time-travel to their recorded states. The point is interaction
  * coverage no hand-written spec enumerates: a DV delete over a
  * compacted widened file after a restore, a merge racing nothing but
  * layered on every prior rewrite shape, rename mapping composed with
  * all of it. Deterministic seed — a failure reproduces exactly, and
  * the op log prints with it.
  */
class LifecycleDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(): String =
    Files.createTempDirectory("graft-chaos").resolve("t").toString

  test("50 seeded random operations track the reference model exactly") {
    runLifecycle(seed = 20260815L, ops = 50)
  }

  test("a second seed exercises a different op interleaving") {
    runLifecycle(seed = 424242L, ops = 40)
  }

  test("35 random ops over a PARTITIONED table track the model") {
    // the hive-layout machinery under random interleaving: dynamic
    // partition overwrite, metadata-only partition drop, and
    // partition-scoped compaction/z-order layered over row DML
    val rnd = new scala.util.Random(77177L)
    val t = tmpTable()
    var model = Map.empty[Long, (String, Int)] // k -> (v, g)
    var nextKey = 0L
    def fresh(n: Int, g: Int): Seq[(Long, String, Int)] = {
      val rows = (0 until n).map(i => (nextKey + i, s"v${nextKey + i}", g))
      nextKey += n
      rows
    }
    def readBack(): Map[Long, (String, Int)] =
      TxLog.read(spark, t).as[(Long, String, Int)].collect()
        .map { case (k, v, g) => k -> (v, g) }.toMap
    val first = (0 until 4).flatMap(g => fresh(3, g))
    TxLog.overwrite(first.toDF("k", "v", "g"), t,
      partitionBy = Some(Seq("g")))
    model = first.map { case (k, v, g) => k -> (v, g) }.toMap

    (1 to 35).foreach { i =>
      rnd.nextInt(7) match {
        case 0 | 1 => // append into random partitions
          val rows = fresh(1 + rnd.nextInt(3), rnd.nextInt(4)) ++
            fresh(1, rnd.nextInt(4))
          TxLog.append(rows.toDF("k", "v", "g"), t)
          model ++= rows.map { case (k, v, g) => k -> (v, g) }
        case 2 => // dynamic partition overwrite of one g
          val g = rnd.nextInt(4)
          val rows = fresh(2, g)
          TxLog.overwritePartitions(rows.toDF("k", "v", "g"), t)
          model = model.filter(_._2._2 != g) ++
            rows.map { case (k, v, gg) => k -> (v, gg) }
        case 3 => // metadata-only partition drop (empty drop is loud? skip)
          val g = rnd.nextInt(4)
          if (model.values.exists(_._2 == g)) {
            TxLog.dropPartitions(spark, t, Map("g" -> g))
            model = model.filter(_._2._2 != g)
          }
        case 4 => // row DML across partitions
          val m0 = 2 + rnd.nextInt(3); val r = rnd.nextInt(m0)
          if (rnd.nextBoolean()) {
            TxLog.delete(spark, t, col("k") % m0 === r,
              deletionVectors = rnd.nextBoolean())
            model = model.filter { case (k, _) => k % m0 != r }
          } else {
            TxLog.update(spark, t, col("k") % m0 === r,
              Seq("v" -> org.apache.spark.sql.functions
                .concat(col("v"), org.apache.spark.sql.functions.lit("u"))))
            model = model.map { case (k, (v, g)) =>
              k -> (if (k % m0 == r) (v + "u", g) else (v, g)) }
          }
        case 5 => // partition-scoped compaction
          TxLog.compact(spark, t, partition = Map("g" -> rnd.nextInt(4)))
        case 6 => // partition-scoped z-order
          TxLog.zorderOptimize(spark, t, Seq("k"), numFiles = 1,
            Map("g" -> rnd.nextInt(4)), curve = "morton")
      }
      assert(readBack() == model, s"partitioned divergence after op $i")
    }
    // the partition listing agrees with the model
    val parts = TxLog.partitions(spark, t).collect()
      .map(r => r.getString(0).toInt -> r.getLong(2)).toMap
    val wantParts = model.values.groupBy(_._2).map { case (g, vs) =>
      g -> vs.size.toLong }
    assert(parts == wantParts, s"SHOW PARTITIONS diverged: $parts vs $wantParts")
  }

  private def runLifecycle(seed: Long, ops: Int): Unit = {
    val rnd = new scala.util.Random(seed)
    val t = tmpTable()
    // model state: key -> value; vName = current logical name of the
    // value column; wide = has k been widened int->long yet
    var model = Map.empty[Long, String]
    var vName = "v"
    var wide = false
    var nextKey = 1L
    var history = Vector.empty[(Long, Map[Long, String])]
    val opLog = new StringBuilder

    def keyCol = col("k")
    def df(rows: Seq[(Long, String)]) = {
      val d = rows.toDF("k", vName)
      if (wide) d else d.withColumn("k", col("k").cast(IntegerType))
    }
    def freshKeys(n: Int): Seq[Long] = {
      val ks = (0 until n).map(i => nextKey + i)
      nextKey += n
      ks
    }
    def readBack(): Map[Long, String] =
      TxLog.read(spark, t).select(col("k").cast(LongType), col(vName))
        .as[(Long, String)].collect().toMap

    // seed commit: k starts NARROW (int) so the widening op is real
    val first = freshKeys(4).map(k => k -> s"v$k")
    TxLog.overwrite(df(first).repartitionByRange(2, keyCol), t)
    model = first.toMap
    history :+= (TxLog.manifest(spark, t).version, model)

    (1 to ops).foreach { i =>
      val op = rnd.nextInt(14)
      op match {
        case 0 | 1 => // append 1-4 fresh keys
          val rows = freshKeys(1 + rnd.nextInt(4)).map(k => k -> s"v$k")
          TxLog.append(df(rows), t)
          model ++= rows
          opLog ++= s"$i: append ${rows.map(_._1).mkString(",")}\n"
        case 2 | 3 => // delete a key-residue slice, CoW or DV
          val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
          val dv = rnd.nextBoolean()
          TxLog.delete(spark, t, keyCol % m === r, deletionVectors = dv)
          model = model.filter { case (k, _) => k % m != r }
          opLog ++= s"$i: delete k%$m==$r dv=$dv\n"
        case 4 | 5 => // update a slice, CoW or DV
          val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
          val dv = rnd.nextBoolean()
          TxLog.update(spark, t, keyCol % m === r,
            Seq(vName -> concat(col(vName), lit(s"u$i"))),
            deletionVectors = dv)
          model = model.map { case (k, v) =>
            k -> (if (k % m == r) v + s"u$i" else v) }
          opLog ++= s"$i: update k%$m==$r dv=$dv\n"
        case 6 => // merge: update some existing, insert some fresh
          val existing = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(3))
          val inserts = freshKeys(1 + rnd.nextInt(2))
          val src = existing.map(k => k -> s"m$i") ++
            inserts.map(k => k -> s"n$k")
          TxLog.mergeInto(spark, t, df(src).withColumnRenamed(vName, "sv"),
            expr("t.k = s.k"),
            matched = Seq(TxLog.MergeUpdate(Map(vName -> expr("s.sv")))),
            notMatched = Seq(TxLog.MergeInsert(Map(
              "k" -> expr("s.k"), vName -> expr("s.sv")))),
            deletionVectors = rnd.nextBoolean())
          model ++= src
          opLog ++= s"$i: merge upd=${existing.mkString(",")} ins=${inserts.mkString(",")}\n"
        case 7 => // compact
          TxLog.compact(spark, t)
          opLog ++= s"$i: compact\n"
        case 8 => // z-order by the key
          TxLog.zorderOptimize(spark, t, Seq("k"), numFiles = 2,
            Map.empty, curve = if (rnd.nextBoolean()) "hilbert" else "morton")
          opLog ++= s"$i: zorder\n"
        case 9 => // materialize any deletion vectors
          TxLog.purgeDvs(spark, t)
          opLog ++= s"$i: purge\n"
        case 10 => // rename the value column (mapping is metadata-only)
          val to = s"v$i"
          TxLog.renameColumn(spark, t, vName, to)
          vName = to
          opLog ++= s"$i: rename -> $to\n"
        case 12 => // deep clone over whatever state accumulated: the
          // fork must equal the model byte-for-byte (DVs, renames,
          // widenings, restores — every interaction), then is discarded
          val fork = tmpTable()
          TxLog.deepClone(spark, t, fork)
          val cloned = TxLog.read(spark, fork)
            .select(col("k").cast(LongType), col(vName))
            .as[(Long, String)].collect().toMap
          assert(cloned == model,
            s"deep clone diverged from the model after op $i\nops:\n$opLog")
          opLog ++= s"$i: deepClone (checked)\n"
        case 13 => // COPY INTO from a fresh parquet landing: the
          // idempotent-ingest path layered over every state — run it
          // TWICE, the second must commit nothing
          val rows = freshKeys(1 + rnd.nextInt(3)).map(k => k -> s"c$k")
          val land = Files.createTempDirectory("graft-chaos-land").toString
          df(rows).coalesce(1).write.mode("append").parquet(land)
          val r1 = TxLog.copyInto(spark, land, t)
          val r2 = TxLog.copyInto(spark, land, t)
          assert(r1.rowsIngested == rows.size && r2.filesIngested == 0,
            s"copyInto not exactly-once after op $i\nops:\n$opLog")
          model ++= rows
          opLog ++= s"$i: copyInto ${rows.map(_._1).mkString(",")}\n"
        case 11 =>
          if (!wide) { // widen k int->long exactly once
            TxLog.alterColumnType(spark, t, "k", LongType)
            wide = true
            nextKey += 3000000000L // beyond-int keys from here on
            opLog ++= s"$i: widen k -> long\n"
          } else { // restore to a random still-alive version
            val (v, snap) = history(rnd.nextInt(history.size))
            TxLog.restore(spark, t, v)
            model = snap
            // restore resurrects that version's schema: re-derive the
            // value-column name and key width from the live schema
            val s0 = TxLog.read(spark, t).schema
            vName = s0.fieldNames.filter(_ != "k").head
            wide = s0("k").dataType == LongType
            // back to a narrow lineage: fresh keys must fit int again
            // (collision-safety only needs them above the LIVE model)
            if (!wide) nextKey = model.keySet.foldLeft(0L)(math.max) + 1
            opLog ++= s"$i: restore -> v$v\n"
          }
      }
      val got = readBack()
      assert(got == model,
        s"divergence after op $i\nops:\n$opLog\nextra=${(got.toSet -- model.toSet).take(5)} missing=${(model.toSet -- got.toSet).take(5)}")
      history :+= (TxLog.manifest(spark, t).version, model)
      // every few ops, spot-check a random earlier version
      if (i % 5 == 0) {
        val (v, snap) = history(rnd.nextInt(history.size))
        val s0 = TxLog.readAsOf(spark, t, v).schema
        val vn = s0.fieldNames.filter(_ != "k").head
        val tv = TxLog.readAsOf(spark, t, v)
          .select(col("k").cast(LongType), col(vn))
          .as[(Long, String)].collect().toMap
        assert(tv == snap, s"time travel to v$v diverged\nops:\n$opLog")
      }
    }

    // end: vacuum to 3 versions — the latest must still equal the
    // model, and a reaped version must refuse time travel
    TxLog.vacuum(spark, t, keepVersions = 3)
    assert(readBack() == model, s"post-vacuum divergence\nops:\n$opLog")
    val kept = TxLog.versions(spark, t)
    assert(kept.size == 3)
    val reaped = history.map(_._1).filterNot(kept.toSet)
    reaped.lastOption.foreach { v =>
      intercept[IllegalArgumentException] { TxLog.readAsOf(spark, t, v) }
    }
  }
}
