package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-format metadata extraction — the Spark analogue of the
  * reference's per-file extractor suite.
  *
  * Reference: `tests/test_extractors.py:test_crystal_structure` — a CIF
  * crystal-structure file yields `number_of_atoms`,
  * `space_group_number`, anonymous `stoichiometry` (counts sorted
  * ascending, mapped to A, B, C…, count 1 elided — e.g. 'A2B3', 'A'),
  * cell `volume`, and the Z-multiplied `composition` (e.g. 'Al12O18');
  * files with no parsable data yield an empty record.
  *
  * The extractor here is a real parser over the CIF key-value grammar
  * (`_tag value` lines, quoted strings, loop_ atom-site blocks) — pure
  * codegen'd regex/array expressions, one narrow projection per file, no
  * UDF, no shuffle: the shape that runs over billions of feedstock files
  * unchanged. Deep lattice math (non-orthorhombic volumes) needs a
  * domain library and stays out of scope — cells are synthesized
  * orthorhombic so volume = a·b·c holds exactly in integer picometres.
  */
object ExtractOps {

  private val el1s = Seq("Al", "Si", "Fe", "Cu", "Na", "Ca", "Mg", "Ti")
  private val el2s = Seq("O", "N", "C", "S")

  /** Deterministic CIF-ish payload per document: two-element formula,
    * Z formula units, space group, integer orthorhombic cell, one
    * atom-site line per atom. Every 13th file carries no data
    * (extractor must return an empty record for it). */
  def cifFiles(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val el1 = element_at(typedLit(el1s), (id % 8 + 1).cast("int"))
    val el2 = element_at(typedLit(el2s), (id % 4 + 1).cast("int"))
    val c1 = (id % 3 + 1).cast("int")
    val c2 = (id % 4 + 1).cast("int")
    val z = (id % 4 + 1).cast("int")
    val a = (lit(400) + id % 100).cast("int")
    val b = (lit(500) + id % 50).cast("int")
    val c = (lit(600) + id % 25).cast("int")
    val atomLine = concat(el1, lit("1 0.0 0.0 0.0\n"))
    val nAtoms = (c1 + c2) * z
    val payload = concat(
      lit("data_d"), id.cast("string"), lit("\n"),
      lit("_chemical_formula_sum '"), el1, c1.cast("string"), lit(" "),
      el2, c2.cast("string"), lit("'\n"),
      lit("_cell_formula_units_Z "), z.cast("string"), lit("\n"),
      lit("_space_group_IT_number "), (id % 230 + 1).cast("string"), lit("\n"),
      lit("_cell_length_a "), a.cast("string"), lit("\n"),
      lit("_cell_length_b "), b.cast("string"), lit("\n"),
      lit("_cell_length_c "), c.cast("string"), lit("\n"),
      lit("_cell_angle_alpha 90\n_cell_angle_beta 90\n_cell_angle_gamma 90\n"),
      lit("loop_\n_atom_site_label\n"),
      call_function("repeat", atomLine, nAtoms))
    Tables.documents(s, dir).select(
      col("doc_id"),
      when(id % 13 === 0, lit("no structured data here\n")).otherwise(payload)
        .as("payload"))
  }

  private def tagInt(payload: Column, tag: String): Column = {
    val m = regexp_extract(payload, s"$tag\\s+(\\d+)", 1)
    when(m =!= "", m.cast("int"))
  }

  /** Crystal-structure extraction over the CIF payloads: parse the
    * key-value tags, count the atom-site lines, derive stoichiometry
    * (anonymous, counts ascending) and Z-multiplied composition. Files
    * without CIF tags produce an all-null record with success=false. */
  def cifExtract(s: SparkSession, dir: String): DataFrame = {
    val p = col("payload")
    val formula = regexp_extract(p, "_chemical_formula_sum\\s+'([^']*)'", 1)
    // formula terms: [(element, count)], count elided means 1
    val terms = transform(split(formula, " "),
      t => struct(
        regexp_extract(t, "^([A-Z][a-z]?)", 1).as("el"),
        coalesce(nullif(regexp_extract(t, "([0-9]+)$", 1), lit("")), lit("1"))
          .cast("int").as("n")))
    val df = cifFiles(s, dir)
      .withColumn("formula", when(formula =!= "", formula))
      .withColumn("terms", when(col("formula").isNotNull, terms))
      .withColumn("z", tagInt(p, "_cell_formula_units_Z"))
      .withColumn("space_group_number", tagInt(p, "_space_group_IT_number"))
      .withColumn("cell_a", tagInt(p, "_cell_length_a"))
      .withColumn("cell_b", tagInt(p, "_cell_length_b"))
      .withColumn("cell_c", tagInt(p, "_cell_length_c"))
      .withColumn("number_of_atoms",
        when(col("formula").isNotNull,
          size(regexp_extract_all(p, lit("(?m)^[A-Z][a-z]?\\d \\S+ \\S+ \\S+$"), lit(0)))))
    df.select(
      col("doc_id"), col("formula"), col("space_group_number"),
      col("number_of_atoms"),
      (col("cell_a").cast("long") * col("cell_b") * col("cell_c")).as("volume"),
      // anonymous stoichiometry: counts ascending → A, B, …; 1 elided
      when(col("formula").isNotNull,
        concat_ws("", transform(
          array_sort(transform(col("terms"), t => t.getField("n"))),
          (n, i) => concat(
            element_at(typedLit(Seq("A", "B", "C", "D")), i + 1),
            when(n === 1, lit("")).otherwise(n.cast("string"))))))
        .as("stoichiometry"),
      // composition: formula order, counts × Z
      when(col("formula").isNotNull,
        concat_ws("", transform(col("terms"),
          t => concat(t.getField("el"), (t.getField("n") * col("z")).cast("string")))))
        .as("composition"),
      col("formula").isNotNull.as("success"))
      .orderBy("doc_id")
  }

  val cifExtractSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 0 THEN 'no structured data here' || chr(10)
      |         ELSE 'data_d' || CAST(doc_id AS VARCHAR) || chr(10) ||
      |    '_chemical_formula_sum ''' ||
      |      ['Al','Si','Fe','Cu','Na','Ca','Mg','Ti'][CAST(doc_id % 8 + 1 AS INTEGER)] ||
      |      CAST(doc_id % 3 + 1 AS VARCHAR) || ' ' ||
      |      ['O','N','C','S'][CAST(doc_id % 4 + 1 AS INTEGER)] ||
      |      CAST(doc_id % 4 + 1 AS VARCHAR) || '''' || chr(10) ||
      |    '_cell_formula_units_Z ' || CAST(doc_id % 4 + 1 AS VARCHAR) || chr(10) ||
      |    '_space_group_IT_number ' || CAST(doc_id % 230 + 1 AS VARCHAR) || chr(10) ||
      |    '_cell_length_a ' || CAST(400 + doc_id % 100 AS VARCHAR) || chr(10) ||
      |    '_cell_length_b ' || CAST(500 + doc_id % 50 AS VARCHAR) || chr(10) ||
      |    '_cell_length_c ' || CAST(600 + doc_id % 25 AS VARCHAR) || chr(10) ||
      |    '_cell_angle_alpha 90' || chr(10) || '_cell_angle_beta 90' || chr(10) ||
      |      '_cell_angle_gamma 90' || chr(10) ||
      |    'loop_' || chr(10) || '_atom_site_label' || chr(10) ||
      |    repeat(['Al','Si','Fe','Cu','Na','Ca','Mg','Ti'][CAST(doc_id % 8 + 1 AS INTEGER)] ||
      |      '1 0.0 0.0 0.0' || chr(10),
      |      CAST((doc_id % 3 + 1 + doc_id % 4 + 1) * (doc_id % 4 + 1) AS INTEGER))
      |    END AS payload
      |  FROM documents),
      |x AS (
      |  SELECT doc_id, payload,
      |    nullif(regexp_extract(payload, '_chemical_formula_sum\s+''([^'']*)''', 1), '') AS formula,
      |    CAST(nullif(regexp_extract(payload, '_cell_formula_units_Z\s+(\d+)', 1), '') AS INTEGER) AS z,
      |    CAST(nullif(regexp_extract(payload, '_space_group_IT_number\s+(\d+)', 1), '') AS INTEGER) AS space_group_number,
      |    CAST(nullif(regexp_extract(payload, '_cell_length_a\s+(\d+)', 1), '') AS INTEGER) AS cell_a,
      |    CAST(nullif(regexp_extract(payload, '_cell_length_b\s+(\d+)', 1), '') AS INTEGER) AS cell_b,
      |    CAST(nullif(regexp_extract(payload, '_cell_length_c\s+(\d+)', 1), '') AS INTEGER) AS cell_c
      |  FROM f),
      |t AS (
      |  SELECT *,
      |    CASE WHEN formula IS NOT NULL THEN
      |      list_transform(string_split(formula, ' '), s -> struct_pack(
      |        el := regexp_extract(s, '^([A-Z][a-z]?)', 1),
      |        n := CAST(coalesce(nullif(regexp_extract(s, '([0-9]+)$', 1), ''), '1') AS INTEGER)))
      |    END AS terms
      |  FROM x)
      |SELECT doc_id, formula, space_group_number,
      |  CASE WHEN formula IS NOT NULL
      |       THEN CAST(len(regexp_extract_all(payload, '(?m)^[A-Z][a-z]?\d \S+ \S+ \S+$')) AS INTEGER)
      |  END AS number_of_atoms,
      |  CAST(cell_a AS BIGINT) * cell_b * cell_c AS volume,
      |  CASE WHEN formula IS NOT NULL THEN
      |    array_to_string(list_transform(
      |      list_sort(list_transform(terms, t -> t.n)),
      |      (n, i) -> ['A','B','C','D'][i] ||
      |        (CASE WHEN n = 1 THEN '' ELSE CAST(n AS VARCHAR) END)), '')
      |  END AS stoichiometry,
      |  CASE WHEN formula IS NOT NULL THEN
      |    array_to_string(list_transform(terms,
      |      t -> t.el || CAST(t.n * z AS VARCHAR)), '')
      |  END AS composition,
      |  formula IS NOT NULL AS success
      |FROM t ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ TDB

  private val tdbEls = Seq("PB", "TE", "NA", "SE", "S", "AU", "SI", "CU")
  private val tdbPhases = Seq("FCC_A1", "BCC_A2", "HCP_A3", "HALITE", "PBTE", "NA2TE")

  /** Deterministic CALPHAD TDB-ish payload per document: a VA vacancy +
    * three ELEMENT declarations, a LIQUID + two PHASE declarations.
    * Every 17th file carries no data. */
  def tdbFiles(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    def el(off: Int) = element_at(typedLit(tdbEls), ((id + off) % 8 + 1).cast("int"))
    def ph(off: Int) = element_at(typedLit(tdbPhases), ((id + off) % 6 + 1).cast("int"))
    val payload = concat(
      lit("$ thermodynamic database d"), id.cast("string"), lit("\n"),
      lit("ELEMENT VA VACUUM 0.0 0.0 0.0 !\n"),
      lit("ELEMENT "), el(0), lit(" FCC_A1 100.0 0.0 0.0 !\n"),
      lit("ELEMENT "), el(3), lit(" FCC_A1 100.0 0.0 0.0 !\n"),
      lit("ELEMENT "), el(5), lit(" FCC_A1 100.0 0.0 0.0 !\n"),
      lit("FUNCTION GHSER 298.15 +1.0; 6000 N !\n"),
      lit("PHASE LIQUID % 1 1.0 !\n"),
      lit("PHASE "), ph(0), lit(" % 2 1 1 !\n"),
      lit("PHASE "), ph(4), lit(" % 1 3.0 !\n"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      when(id % 17 === 0, lit("not a database\n")).otherwise(payload).as("payload"))
  }

  /** CALPHAD TDB extraction (tests/test_extractors.py:test_tdb): the
    * `calphad.phases` list is the PHASE declarations in file order and
    * `material.composition` concatenates the title-cased ELEMENT symbols
    * in declaration order ('SeVaTeNaSPb'-style). Pure regex/array
    * expressions over the payload column — no UDF, no shuffle. */
  def tdbExtract(s: SparkSession, dir: String): DataFrame = {
    val p = col("payload")
    val els = regexp_extract_all(p, lit("(?m)^ELEMENT (\\w+)"), lit(1))
    val phases = regexp_extract_all(p, lit("(?m)^PHASE (\\w+)"), lit(1))
    tdbFiles(s, dir)
      .withColumn("els", when(size(els) > 0, els))
      .select(
        col("doc_id"),
        when(col("els").isNotNull, concat_ws(",", phases)).as("phases"),
        when(col("els").isNotNull,
          concat_ws("", transform(col("els"), e =>
            concat(upper(substring(e, 1, 1)), lower(substring(e, 2, 16))))))
          .as("composition"),
        col("els").isNotNull.as("success"))
      .orderBy("doc_id")
  }

  val tdbExtractSql: String = {
    def el(off: Int) =
      s"['PB','TE','NA','SE','S','AU','SI','CU'][CAST((doc_id + $off) % 8 + 1 AS INTEGER)]"
    def ph(off: Int) =
      s"['FCC_A1','BCC_A2','HCP_A3','HALITE','PBTE','NA2TE'][CAST((doc_id + $off) % 6 + 1 AS INTEGER)]"
    s"""WITH f AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 17 = 0 THEN 'not a database' || chr(10)
       |         ELSE '$$ thermodynamic database d' || CAST(doc_id AS VARCHAR) || chr(10) ||
       |    'ELEMENT VA VACUUM 0.0 0.0 0.0 !' || chr(10) ||
       |    'ELEMENT ' || ${el(0)} || ' FCC_A1 100.0 0.0 0.0 !' || chr(10) ||
       |    'ELEMENT ' || ${el(3)} || ' FCC_A1 100.0 0.0 0.0 !' || chr(10) ||
       |    'ELEMENT ' || ${el(5)} || ' FCC_A1 100.0 0.0 0.0 !' || chr(10) ||
       |    'FUNCTION GHSER 298.15 +1.0; 6000 N !' || chr(10) ||
       |    'PHASE LIQUID % 1 1.0 !' || chr(10) ||
       |    'PHASE ' || ${ph(0)} || ' % 2 1 1 !' || chr(10) ||
       |    'PHASE ' || ${ph(4)} || ' % 1 3.0 !' || chr(10)
       |    END AS payload
       |  FROM documents),
       |x AS (
       |  SELECT doc_id,
       |    regexp_extract_all(payload, 'ELEMENT (\\w+)', 1) AS els,
       |    regexp_extract_all(payload, 'PHASE (\\w+)', 1) AS phases
       |  FROM f)
       |SELECT doc_id,
       |  CASE WHEN len(els) > 0 THEN array_to_string(phases, ',') END AS phases,
       |  CASE WHEN len(els) > 0 THEN array_to_string(list_transform(els,
       |    e -> upper(substr(e, 1, 1)) || lower(substr(e, 2))), '') END AS composition,
       |  len(els) > 0 AS success
       |FROM x ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------ filename rules

  /** The reference's filename-mapping extractor test vectors
    * (tests/test_extractors.py:test_filename): output field → regex,
    * fields with no match omitted (null here). */
  val filenameMapping: Seq[(String, String)] = Seq(
    "composition" -> "^.{2}",
    "foo" -> "foo:.{3}",
    "ext" -> "\\..{3,4}$")

  /** Generic API: apply a field→regex mapping to a filename column —
    * `extract_filename` re-expressed as one narrow projection. */
  def filenameExtractOf(files: DataFrame, idCol: String, nameCol: String,
      mapping: Seq[(String, String)]): DataFrame =
    mapping.foldLeft(files.select(col(idCol), col(nameCol))) { case (df, (field, rx)) =>
      df.withColumn(field, nullif(regexp_extract(col(nameCol), s"($rx)", 1), lit("")))
    }

  /** Synthetic filenames exercising every branch of the test mapping:
    * composition prefix always present, `foo:` tag and extension each
    * present on a subset. */
  def filenameFiles(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val el = element_at(typedLit(el1s), (id % 8 + 1).cast("int"))
    Tables.documents(s, dir).select(
      col("doc_id"),
      concat(
        el, (id % 4).cast("string"),
        when(id % 3 === 0, concat(lit("foo:"), substring(md5(id.cast("string")), 1, 3)))
          .otherwise(lit("_sample")),
        when(id % 5 === 0, lit(".data"))
          .when(id % 5 === 1, lit(".txt"))
          .otherwise(lit(""))).as("filename"))
  }

  def filenameExtract(s: SparkSession, dir: String): DataFrame =
    filenameExtractOf(filenameFiles(s, dir), "doc_id", "filename", filenameMapping)
      .orderBy("doc_id")

  val filenameExtractSql: String =
    """WITH f AS (
      |  SELECT doc_id,
      |    ['Al','Si','Fe','Cu','Na','Ca','Mg','Ti'][CAST(doc_id % 8 + 1 AS INTEGER)] ||
      |    CAST(doc_id % 4 AS VARCHAR) ||
      |    CASE WHEN doc_id % 3 = 0 THEN 'foo:' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 3)
      |         ELSE '_sample' END ||
      |    CASE WHEN doc_id % 5 = 0 THEN '.data'
      |         WHEN doc_id % 5 = 1 THEN '.txt'
      |         ELSE '' END AS filename
      |  FROM documents)
      |SELECT doc_id, filename,
      |  nullif(regexp_extract(filename, '(^.{2})', 1), '') AS composition,
      |  nullif(regexp_extract(filename, '(foo:.{3})', 1), '') AS foo,
      |  nullif(regexp_extract(filename, '(\..{3,4}$)', 1), '') AS ext
      |FROM f ORDER BY doc_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cif_extract" -> (cifExtract _),
    "q_tdb_extract" -> (tdbExtract _),
    "q_filename_extract" -> (filenameExtract _))

  def oracles: Map[String, String] = Map(
    "q_cif_extract" -> cifExtractSql,
    "q_tdb_extract" -> tdbExtractSql,
    "q_filename_extract" -> filenameExtractSql)
}
