package graft

import graft.multimodal.Multimodal
import graft.pipelines.Pipelines

/** End-to-end dry-run golden transcript, the port of the reference's
  * `tests/test_import_fantoir.py:63-155` pattern, plus multimodal
  * plumbing checks.
  */
class PipelinesSpec extends SparkSpec {

  test("fantoir dry run produces DDL for the 3 non-header tables") {
    val dir = java.nio.file.Files.createTempDirectory("fantoirp")
    val path = s"$dir/fantoir.txt"
    val voieLine =
      "010001A008WLOT BELLEVUE                   N  3  0          " +
        "00000000000000 00000002001351               000592   BELLEVUE"
    val directionLine =
      "010        AIN                                             " +
        "00000000000000 00000000000000"
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      (directionLine + "\n" + voieLine + "\n").getBytes("ISO-8859-1"))

    val transcripts = Pipelines.importFantoir(spark, path, "pg")
    assert(transcripts.keySet == Set("direction", "commune", "voie"))
    val voie = transcripts("voie")
    assert(voie.head == "DROP TABLE IF EXISTS voie")
    assert(voie(1).startsWith("CREATE TABLE voie ("))
    assert(voie(1).contains("code_departement"))
    assert(voie(1).contains(
      "dernier_mot_entierement_alphabetique_du_libelle_de_la_voie"))
    assert(voie.contains("TRUNCATE voie"))
    assert(voie.contains("ANALYZE voie"))
    // no FANTOIR indices — matches the reference's observable behavior
    assert(!voie.exists(_.startsWith("CREATE INDEX")))
  }

  test("dialect registry resolves aliases, rejects unknown") {
    assert(Pipelines.dialect("postgres") eq
      graft.sinks.PostgresDialect)
    assert(Pipelines.dialect("MYSQL") eq graft.sinks.MariaDbDialect)
    intercept[IllegalArgumentException] { Pipelines.dialect("oracle") }
  }

  test("multimodal: binary read → meta + features, deterministic stubs") {
    val dir = java.nio.file.Files.createTempDirectory("media")
    java.nio.file.Files.write(dir.resolve("a.jpg"),
      Array.tabulate[Byte](256)(_.toByte))
    java.nio.file.Files.write(dir.resolve("b.wav"),
      Array.fill[Byte](64)(7))
    val binary = Multimodal.readBinary(spark, dir.toString)
    val meta = Multimodal.extractMeta(binary).collect()
      .map(m => m.path.split('/').last -> m).toMap
    assert(meta("a.jpg").kind == "image")
    assert(meta("a.jpg").channels == 3)
    assert(meta("a.jpg").width >= 64)
    assert(meta("b.wav").kind == "audio")
    assert(meta("b.wav").durationMs == 4L)

    val feats = Multimodal.extractFeatures(binary, bins = 4).collect()
      .map(f => f.path.split('/').last -> f).toMap
    assert(feats("a.jpg").histogram.toSeq == Seq(0.25, 0.25, 0.25, 0.25))
    assert(feats("a.jpg").fingerprint ==
      graft.functions.PolyHash.hashBytes(Array.tabulate[Byte](256)(_.toByte)))
    // deterministic: second run yields identical features
    val again = Multimodal.extractFeatures(binary, bins = 4).collect()
      .map(f => f.path.split('/').last -> f.fingerprint).toMap
    assert(again("a.jpg") == feats("a.jpg").fingerprint)
  }

  test("multimodal: resize and frame-sample batch shapes") {
    val dir = java.nio.file.Files.createTempDirectory("media2")
    java.nio.file.Files.write(dir.resolve("a.jpg"),
      Array.tabulate[Byte](300)(_.toByte))
    java.nio.file.Files.write(dir.resolve("v.mp4"),
      Array.tabulate[Byte](4096)(i => (i % 127).toByte))
    val binary = Multimodal.readBinary(spark, dir.toString)

    val resized = Multimodal.resizeImages(
      binary.filter(org.apache.spark.sql.functions.col("path")
        .endsWith(".jpg")), 32, 32).collect()
    assert(resized.length == 1)
    assert(resized.head.width == 32 && resized.head.height == 32)
    assert(resized.head.content.length == 32 * 32)

    val frames = Multimodal.sampleFrames(
      binary.filter(org.apache.spark.sql.functions.col("path")
        .endsWith(".mp4")), n = 4).collect().sortBy(_.frame_idx)
    assert(frames.length == 4)
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 1, 2, 3))
    // timestamps span [0, duration]; duration stub = 4096/1024 = 4ms
    assert(frames.head.frame_ts_ms == 0L)
    assert(frames.last.frame_ts_ms == 4L)
    assert(frames.forall(_.frame.nonEmpty))
    // frames are distinct slices
    assert(frames.map(_.frame.toSeq).distinct.length == 4)
  }

  test("deces dry run: typed dates, hash index on nom") {
    val dir = java.nio.file.Files.createTempDirectory("deces")
    val line = "DUPONT*JEAN PIERRE/".padTo(80, ' ') + "1" + "19230512" +
      "75101" + "PARIS".padTo(30, ' ') + "FRANCE".padTo(30, ' ') +
      "20200301" + "75102" + "123".padTo(9, ' ')
    val path = dir.resolve("deces-2020.txt")
    java.nio.file.Files.write(path, (line + "\n").getBytes("UTF-8"))
    val transcript = Pipelines.importDeces(spark, path.toString, "postgres")
    assert(transcript.head == "DROP TABLE IF EXISTS deces")
    assert(transcript(1).contains("date_naiss"))
    assert(transcript(1).contains("date")) // typed DATE column
    assert(transcript.contains(
      "CREATE INDEX nom_deces_idx ON deces USING hash(nom)"))
    // bulk_copy defaults ON (import_sirene.py:411-413): the PG dry run
    // renders the COPY statement between TRUNCATE and ANALYZE
    val kinds = transcript.map(_.split("[ \n]")(0))
    assert(kinds.containsSlice(Seq("TRUNCATE", "COPY", "ANALYZE")),
      transcript.mkString(" | "))
    // MariaDB dry run renders the LOAD DATA bridge statement instead
    val maria = Pipelines.importDeces(spark, path.toString, "mariadb")
    assert(maria.exists(_.startsWith("LOAD DATA LOCAL INFILE")),
      maria.mkString(" | "))
    // bulkCopy = false falls back to the batched INSERT transcript
    val sink = new graft.sinks.JdbcSink("jdbc:dry",
      new java.util.Properties, graft.sinks.PostgresDialect)
    assert(sink.dryRunTranscript(
      graft.schema.SqlTableDef("t", Seq.empty, Seq.empty), None)
      .exists(_.startsWith("INSERT INTO")))
  }
}
