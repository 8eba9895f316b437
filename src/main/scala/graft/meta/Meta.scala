package graft.meta

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.security.MessageDigest

/** Canonical-JSON sha256 hashing — the reference's self-validation
  * discipline (/root/reference/xcorr/util/hasher.py:106-319: hash the
  * sorted-key JSON of metadata, ignore the hash keys themselves) re-done
  * in Scala. Used for preprocess-config hashes stored in manifests and
  * table properties and revalidated before reuse
  * (/root/reference/xcorr/io/validate.py:136-202).
  */
object Hasher {
  val IgnoredKeys: Set[String] = Set("sha256_hash", "sha256_hash_metadata", "add_offset", "scale_factor")

  def sha256Hex(s: String): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(s.getBytes(StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString
  }

  /** Deterministic JSON: sorted keys, no spaces. `forHashing=true` drops the
    * reference's ignored keys (hasher.py:22-26) so a stored hash never
    * hashes itself.
    */
  def json(v: Any, forHashing: Boolean = false): String = v match {
    case null            => "null"
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]]
        .filterNot { case (k, _) => forHashing && IgnoredKeys(k) }
        .toSeq.sortBy(_._1)
        .map { case (k, x) => s"${quote(k)}:${json(x, forHashing)}" }
        .mkString("{", ",", "}")
    case s: Seq[_]       => s.map(json(_, forHashing)).mkString("[", ",", "]")
    case s: String       => quote(s)
    case b: Boolean      => b.toString
    case d: Double       => if (d == d.toLong.toDouble) d.toLong.toString else d.toString
    case other           => other.toString
  }

  def canonicalJson(v: Any): String = json(v, forHashing = true)

  def hashObj(v: Any): String = sha256Hex(canonicalJson(v))

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
}

/** CF-1.9 global-attribute template preserved as table properties —
  * the reference requires institution/author/source and
  * Conventions=CF-1.9 on every dataset
  * (/root/reference/xcorr/core/init.py:106-151,
  * /root/reference/xcorr/util/metadata.py:26-77); BASELINE.json requires
  * them preserved as Iceberg-style table/snapshot properties.
  */
object Cf19 {
  def props(
      title: String,
      institution: String = "n/a",
      author: String = "n/a",
      source: String = "xcorrspark",
      extra: Map[String, String] = Map.empty
  ): Map[String, String] = {
    val base = Map(
      "title" -> title,
      "institution" -> institution,
      "author" -> author,
      "source" -> source,
      "Conventions" -> "CF-1.9",
      "engine" -> "xcorrspark-0.1.0",
      "references" -> "https://github.com/psmsmets/xcorr (semantics reference)"
    ) ++ extra
    base + ("sha256_hash_metadata" -> Hasher.hashObj(base))
  }
}

/** Thin Iceberg-like table layer: a Parquet directory + a JSON properties
  * sidecar + append-only snapshot records. No Iceberg runtime jar ships in
  * this sandbox (SURVEY.md §7.0), so properties/snapshots emulate the
  * Iceberg semantics the north rule names (CF-1.9 attrs + commit history
  * as snapshot properties). The write itself follows the reference's
  * atomic tmp-file + rename pattern (/root/reference/xcorr/io/write.py:
  * 122-171).
  */
object TableFormat {
  def writeProps(dir: String, props: Map[String, String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    val json = Hasher.json(props)
    val tmp = Paths.get(dir, "_table_properties.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, Paths.get(dir, "_table_properties.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def readProps(dir: String): Map[String, String] = {
    val p = Paths.get(dir, "_table_properties.json")
    if (!Files.exists(p)) return Map.empty
    // minimal flat-object JSON parse (we only ever write flat string maps)
    val s = Files.readString(p).trim.stripPrefix("{").stripSuffix("}")
    if (s.isEmpty) Map.empty
    else {
      val re = "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
      re.findAllMatchIn(s).map(m => unescape(m.group(1)) -> unescape(m.group(2))).toMap
    }
  }

  /** Append a snapshot record (history lineage — the reference's
    * `historicize` strings, /root/reference/xcorr/util/history.py:25-55).
    */
  def appendSnapshot(dir: String, record: Map[String, String]): Unit = {
    val snapDir = Paths.get(dir, "_snapshots")
    Files.createDirectories(snapDir)
    val n = Files.list(snapDir).count()
    val tmp = snapDir.resolve(s".snap-$n.json.tmp")
    Files.writeString(tmp, Hasher.json(record))
    Files.move(tmp, snapDir.resolve(f"snap-$n%05d.json"), StandardCopyOption.ATOMIC_MOVE)
  }

  private def unescape(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\").replace("\\n", "\n")
      .replace("\\r", "\r").replace("\\t", "\t")
}
