package graft.extensions

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/**
 * Version + lineage stamp for saved index trees: a tiny `_meta.json` at
 * the tree root recording which version the tree holds, the tree it was
 * extended from (`parent`), the accepted-batch sink trees compaction has
 * folded in (`folded`), and footer-exact row counts per relation.
 *
 * The lifecycle problem this closes: every index family versions by
 * extension (probe version N while N+1 accumulates, swap, `close()` N),
 * and before the stamp a saved tree was anonymous — `close()` on a
 * handle whose tree another job had already re-saved deleted the WRONG
 * version silently, and a compaction fed a stale handle folded batches
 * into an index the disk no longer held. With the stamp both become
 * refusals: [[requireCurrent]] compares the handle's version against
 * the tree's before any destructive/extending operation.
 *
 * The stamp is advisory metadata for trees written by older rounds
 * (absent file => no check fires), so old saved indexes keep loading.
 */
object IndexMeta {

  /** One saved tree's identity. `rows` is footer-exact per sub-relation
    * (O(files) metadata reads, zero Spark jobs — `ParquetMeta`). */
  final case class Meta(version: Long, parent: Option[String],
                        folded: Seq[String], rows: Map[String, Long])

  val FileName = "_meta.json"

  def write(spark: SparkSession, dir: String, meta: Meta): Unit = {
    val om = new ObjectMapper()
    val root = om.createObjectNode()
    root.put("version", meta.version)
    meta.parent.foreach(root.put("parent", _))
    val fn = root.putArray("folded")
    meta.folded.foreach(fn.add)
    val rn = root.putObject("rows")
    meta.rows.toSeq.sortBy(_._1).foreach { case (k, v) => rn.put(k, v) }
    val p = new HPath(new HPath(dir), FileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // tmp + overwrite-rename: a crash mid-write must not leave a
    // truncated stamp where a valid one stood, and a crash between the
    // steps must not leave the tree UNSTAMPED (which the lenient read
    // degrades to no-version-checks — the exact hazard the stamp
    // refuses). FileContext.rename(OVERWRITE) replaces in one step; the
    // delete+rename fallback (FS without FileContext support) keeps a
    // small unstamped window but never a truncated stamp.
    val tmp = new HPath(new HPath(dir), FileName + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(om.writerWithDefaultPrettyPrinter.writeValueAsBytes(root))
    finally out.close()
    try {
      org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, fs.getConf)
        .rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException | _: java.io.FileNotFoundException =>
        if (fs.exists(p)) fs.delete(p, false)
        require(fs.rename(tmp, p), s"could not move $tmp into place at $p")
    }
  }

  def read(spark: SparkSession, dir: String): Option[Meta] = {
    val p = new HPath(new HPath(dir), FileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val bytes =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](4096)
          var n = in.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          buf.toByteArray
        } finally in.close()
      // a corrupted/truncated stamp degrades to the documented
      // advisory-absent path (no check fires) instead of bricking every
      // load/close of an otherwise valid tree with a parse exception
      scala.util.Try {
        val node = new ObjectMapper().readTree(bytes)
        Meta(
          node.get("version").asLong(),
          Option(node.get("parent")).map(_.asText()),
          Option(node.get("folded"))
            .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil),
          Option(node.get("rows"))
            .map(_.fields().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap)
            .getOrElse(Map.empty))
      }.recoverWith { case e =>
        System.err.println(
          s"WARN IndexMeta: unreadable $FileName at $dir (${e.getMessage}) " +
            "— treating the tree as unstamped; version checks will not fire")
        scala.util.Failure(e)
      }.toOption
    }
  }

  /** Footer-exact row counts for the named sub-relations of a tree. */
  def rowCounts(spark: SparkSession, dir: String,
                relations: Seq[String]): Map[String, Long] =
    relations.map(r =>
      r -> graft.sources.ParquetMeta.rowCount(spark, s"$dir/$r")).toMap

  /** Refuse an operation on a STALE handle: if the tree at `dir` carries
    * a version stamp different from the handle's, another job has saved
    * a different version there since this handle was created — closing
    * would delete the wrong version; extending/compacting would fold
    * work into an index the disk no longer holds. Trees without a stamp
    * (pre-stamp format) are exempt. */
  def requireCurrent(spark: SparkSession, dir: String,
                     haveVersion: Long, op: String): Unit =
    read(spark, dir).foreach { m =>
      require(m.version == haveVersion,
        s"$op refused: index tree $dir holds version ${m.version} but this " +
          s"handle is version $haveVersion — reload the tree (or re-point " +
          "the handle) before operating on it")
    }
}
