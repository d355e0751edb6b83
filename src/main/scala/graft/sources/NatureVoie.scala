package graft.sources

/** FANTOIR street-nature code → label dictionary (L1 in SURVEY.md §2.a).
  *
  * The mapping itself is open data from data.gouv.fr (the table the
  * reference also ships, `/root/reference/datagouv_tools/fantoir.py:27-218`),
  * loaded here from a tab-separated classpath resource
  * (`nature_voie.csv`). The inverse maps each label to its code,
  * splitting multi-labels on ", " (`fantoir.py:220-221`).
  */
object NatureVoie {

  val labelByCode: Map[String, String] = {
    val in = getClass.getResourceAsStream("/nature_voie.csv")
    require(in != null, "nature_voie.csv missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().drop(1).map { line =>
        val Array(code, label) = line.split("\t", 2)
        code -> label
      }.toMap
    } finally src.close()
  }

  /** label → code; multi-labels ("A, B") contribute one entry per label. */
  val codeByLabel: Map[String, String] = (for {
    (code, labels) <- labelByCode.toSeq
    label <- labels.split(", ")
  } yield label -> code).toMap
}
