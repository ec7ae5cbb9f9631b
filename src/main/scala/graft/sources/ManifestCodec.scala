package graft.sources

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}

import graft.sources.TxLog.{ColStats, DeltaRec, DvEntry, FileEntry, IdentitySpec, Manifest}

/** Streaming decoder for the transaction-log records — the READ half of
  * the manifest codec. The writer stays json4s `Serialization.write`
  * (battle-tested, and the delta round-trip gate compares case classes,
  * not bytes); reading, however, is the driver-side hot path a COLD
  * snapshot resolution pays over the full file census, and json4s
  * (AST + reflection extraction) measures ~15 MB/s — ~15 s for the
  * ~220 MB checkpoint a 10⁶-file table (the 100 TB design point)
  * writes. This jackson-core token walk decodes the same documents at
  * memory-bandwidth-class speed, keeping cold resolution in the
  * sub-second range per checkpoint.
  *
  * Safety: [[ManifestCodecSpec]] differentially pins
  * `decode(json4sWrite(m)) == m` over manifests exercising every field
  * (present and absent), and [[TxLog.readRawRecord]] falls back to the
  * json4s path — loudly, on stderr — if this decoder ever throws, so a
  * decode gap can slow a read but never break one.
  */
private[sources] object ManifestCodec {

  private val factory = new JsonFactory()

  /** Decode one log record; `Left` = delta, `Right` = full manifest —
    * the same discrimination [[TxLog.readRawRecord]] applies (a `kind`
    * field valued "delta").
    */
  def decode(str: String): Either[DeltaRec, Manifest] = {
    val fields = new java.util.HashMap[String, Any]()
    val p = factory.createParser(str)
    try {
      expect(p, p.nextToken(), JsonToken.START_OBJECT)
      while (p.nextToken() != JsonToken.END_OBJECT) {
        val name = p.currentName()
        p.nextToken()
        fields.put(name, value(p, name))
      }
    } finally p.close()
    def str0(n: String): String = fields.get(n).asInstanceOf[String]
    def lng(n: String): Long = fields.get(n) match {
      case null => fail(s"missing long field '$n'")
      case l: java.lang.Long => l.longValue()
      case other => fail(s"field '$n': expected long, got $other")
    }
    def opt[T](n: String): Option[T] =
      Option(fields.get(n)).map(_.asInstanceOf[T])
    def seqS(n: String): Seq[String] =
      Option(fields.get(n)).map(_.asInstanceOf[Seq[String]]).getOrElse(
        fail(s"missing array field '$n'"))
    if (fields.get("kind") == "delta")
      Left(DeltaRec("delta", lng("version"), lng("base"), str0("action"),
        lng("tsMillis"), seqS("add"), seqS("remove"),
        opt[String]("schemaJson"),
        opt[Seq[FileEntry]]("addStats"),
        opt[Seq[DvEntry]]("dvPut"),
        opt[Seq[String]]("dvDrop"),
        opt[Map[String, Long]]("txn"),
        opt[Map[String, Long]]("txnPut"),
        opt[Seq[String]]("txnDrop"),
        opt[Seq[String]]("cdf"),
        opt[Map[String, String]]("constraints"),
        opt[Seq[String]]("partitionBy"),
        opt[Seq[String]]("bloomIndex"),
        opt[Map[String, String]]("generated"),
        opt[Seq[String]]("dropped"),
        opt[Map[String, IdentitySpec]]("identity"),
        opt[Map[String, String]]("renames"),
        opt[Map[String, String]]("properties"),
        opt[Seq[String]]("features")))
    else
      Right(Manifest(lng("version"), str0("action"), seqS("files"),
        str0("schemaJson"), lng("tsMillis"),
        opt[Seq[FileEntry]]("stats"),
        opt[Map[String, Long]]("txn"),
        opt[Seq[String]]("cdf"),
        opt[Map[String, String]]("constraints"),
        opt[Seq[String]]("partitionBy"),
        opt[Seq[String]]("bloomIndex"),
        opt[Seq[DvEntry]]("dvs"),
        opt[Map[String, String]]("generated"),
        opt[Seq[String]]("dropped"),
        opt[Map[String, IdentitySpec]]("identity"),
        opt[Map[String, String]]("renames"),
        opt[Map[String, String]]("properties"),
        opt[Seq[String]]("features")))
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"manifest codec: $msg")

  private def expect(p: JsonParser, got: JsonToken, want: JsonToken): Unit =
    if (got != want) fail(s"expected $want, got $got at ${p.currentLocation()}")

  /** Typed decode of ONE field value; the parser sits ON the value's
    * first token. Container shapes are keyed by field NAME — the log's
    * schema is fixed, so name-directed decoding beats a generic tree.
    */
  private def value(p: JsonParser, name: String): Any = name match {
    case "version" | "base" | "tsMillis" => p.getLongValue: java.lang.Long
    case "kind" | "action" | "schemaJson" => p.getText
    case "files" | "add" | "remove" | "cdf" | "partitionBy" |
         "bloomIndex" | "dropped" | "dvDrop" | "txnDrop" |
         "features" => stringArray(p)
    case "stats" | "addStats" => entryArray(p)
    case "dvs" | "dvPut" => dvArray(p)
    case "txn" | "txnPut" => longMap(p)
    case "constraints" | "generated" | "renames" | "properties" =>
      stringMap(p)
    case "identity" => identityMap(p)
    case other => fail(s"unknown log-record field '$other'")
  }

  private def stringArray(p: JsonParser): Seq[String] = {
    expect(p, p.currentToken(), JsonToken.START_ARRAY)
    val b = Seq.newBuilder[String]
    while (p.nextToken() != JsonToken.END_ARRAY) b += p.getText
    b.result()
  }

  private def stringMap(p: JsonParser): Map[String, String] = {
    expect(p, p.currentToken(), JsonToken.START_OBJECT)
    val b = Map.newBuilder[String, String]
    while (p.nextToken() != JsonToken.END_OBJECT) {
      val k = p.currentName(); p.nextToken(); b += k -> p.getText
    }
    b.result()
  }

  private def longMap(p: JsonParser): Map[String, Long] = {
    expect(p, p.currentToken(), JsonToken.START_OBJECT)
    val b = Map.newBuilder[String, Long]
    while (p.nextToken() != JsonToken.END_OBJECT) {
      val k = p.currentName(); p.nextToken(); b += k -> p.getLongValue
    }
    b.result()
  }

  private def identityMap(p: JsonParser): Map[String, IdentitySpec] = {
    expect(p, p.currentToken(), JsonToken.START_OBJECT)
    val b = Map.newBuilder[String, IdentitySpec]
    while (p.nextToken() != JsonToken.END_OBJECT) {
      val k = p.currentName()
      expect(p, p.nextToken(), JsonToken.START_OBJECT)
      var step = 0L; var next = 0L
      while (p.nextToken() != JsonToken.END_OBJECT) {
        val f = p.currentName(); p.nextToken()
        f match {
          case "step" => step = p.getLongValue
          case "next" => next = p.getLongValue
          case other => fail(s"IdentitySpec field '$other'")
        }
      }
      b += k -> IdentitySpec(step, next)
    }
    b.result()
  }

  private def dvArray(p: JsonParser): Seq[DvEntry] = {
    expect(p, p.currentToken(), JsonToken.START_ARRAY)
    val b = Seq.newBuilder[DvEntry]
    while (p.nextToken() != JsonToken.END_ARRAY) {
      expect(p, p.currentToken(), JsonToken.START_OBJECT)
      var path: String = null; var dv: String = null; var deleted = 0L
      while (p.nextToken() != JsonToken.END_OBJECT) {
        val f = p.currentName(); p.nextToken()
        f match {
          case "path" => path = p.getText
          case "dv" => dv = p.getText
          case "deleted" => deleted = p.getLongValue
          case other => fail(s"DvEntry field '$other'")
        }
      }
      if (path == null || dv == null) fail("DvEntry missing path/dv")
      b += DvEntry(path, dv, deleted)
    }
    b.result()
  }

  private def colStats(p: JsonParser): ColStats = {
    expect(p, p.currentToken(), JsonToken.START_OBJECT)
    var mn: Option[String] = None; var mx: Option[String] = None
    var nulls = 0L
    while (p.nextToken() != JsonToken.END_OBJECT) {
      val f = p.currentName(); p.nextToken()
      f match {
        case "min" => mn = Some(p.getText)
        case "max" => mx = Some(p.getText)
        case "nulls" => nulls = p.getLongValue
        case other => fail(s"ColStats field '$other'")
      }
    }
    ColStats(mn, mx, nulls)
  }

  private def entryArray(p: JsonParser): Seq[FileEntry] = {
    expect(p, p.currentToken(), JsonToken.START_ARRAY)
    val b = Seq.newBuilder[FileEntry]
    while (p.nextToken() != JsonToken.END_ARRAY) {
      expect(p, p.currentToken(), JsonToken.START_OBJECT)
      var path: String = null; var rows = 0L
      var stats: Map[String, ColStats] = Map.empty
      var parts: Option[Map[String, String]] = None
      var bytes: Option[Long] = None
      while (p.nextToken() != JsonToken.END_OBJECT) {
        val f = p.currentName(); p.nextToken()
        f match {
          case "path" => path = p.getText
          case "rows" => rows = p.getLongValue
          case "bytes" => bytes = Some(p.getLongValue)
          case "parts" => parts = Some(stringMap(p))
          case "stats" =>
            expect(p, p.currentToken(), JsonToken.START_OBJECT)
            val sb = Map.newBuilder[String, ColStats]
            while (p.nextToken() != JsonToken.END_OBJECT) {
              val c = p.currentName(); p.nextToken()
              sb += c -> colStats(p)
            }
            stats = sb.result()
          case other => fail(s"FileEntry field '$other'")
        }
      }
      if (path == null) fail("FileEntry missing path")
      b += FileEntry(path, rows, stats, parts, bytes)
    }
    b.result()
  }
}
