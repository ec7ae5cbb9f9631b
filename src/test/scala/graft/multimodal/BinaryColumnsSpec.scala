package graft.multimodal

import graft.{SparkSpec, Tables}

class BinaryColumnsSpec extends SparkSpec {

  test("assets carry binary payload + typed metadata struct") {
    val a = BinaryColumns.assets(Tables.documents(spark, sfDir))
    val schema = a.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    assert(a.count() > 0)
  }

  test("frame sampling emits ceil(n_frames/step) rows and bounded resize dims") {
    import org.apache.spark.sql.functions.col
    val decoded = BinaryColumns.decode(
      BinaryColumns.assets(Tables.documents(spark, sfDir)).limit(50))
    val (rw, rh) = BinaryColumns.resizedDims(col("width"), col("height"), 512)
    val sampled = BinaryColumns.sampleFrames(decoded, step = 4)
      .withColumn("rw", rw).withColumn("rh", rh)
    val perDoc = sampled.groupBy("doc_id", "n_frames")
      .count().collect()
    perDoc.foreach { r =>
      val expected = (r.getAs[Int]("n_frames") + 3) / 4
      assert(r.getAs[Long]("count") == expected)
    }
    sampled.select("rw", "rh").collect().foreach { r =>
      assert(r.getInt(0) <= 512 && r.getInt(1) <= 512)
      assert(r.getInt(0) > 0 && r.getInt(1) > 0)
    }
  }

  test("decode is deterministic and emits the declared schema") {
    val a = BinaryColumns.assets(Tables.documents(spark, sfDir)).limit(20)
    val d1 = BinaryColumns.decode(a).collect().sortBy(_.getLong(0))
    val d2 = BinaryColumns.decode(a).collect().sortBy(_.getLong(0))
    assert(d1.toSeq == d2.toSeq)
    assert(BinaryColumns.decode(a).schema == BinaryColumns.decodedSchema)
    // n_bytes of a UTF-8 text payload matches the text's byte length
    d1.foreach { r => assert(r.getInt(1) > 0) }
  }
}
