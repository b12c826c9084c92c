package graft.operators

import graft.{GraftQuery, QueryGroup, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2-I: the scalar function surface (ops 53–57), the SAS
  * function vocabulary (SUBSTR/SCAN/TRANWRD/CATX/INTNX/INTCK/PUT/INPUT/…)
  * mapped onto codegen'd `org.apache.spark.sql.functions`.
  *
  * 100 TB note: everything here is a map-only projection inside
  * whole-stage codegen — zero shuffles beyond the presentation sort; the
  * regex functions compile their pattern once per task. No UDFs anywhere:
  * built-ins keep codegen AND give the DuckDB oracle an exact twin.
  */
object Scalars extends QueryGroup {

  /** op 53 — string functions: SUBSTR, SCAN, TRANWRD, CATX, UPCASE, STRIP,
    * INDEX, LENGTH, PRX* on the documents table. */
  private val fnString = GraftQuery(
    "fn_string",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          substring(col("text"), 1, 12).as("prefix12"),
          element_at(split(col("text"), " "), 1).as("first_word"),
          regexp_replace(col("text"), "data", "DATA").as("tranwrd"),
          concat_ws("|", col("lang"), col("source")).as("catx"),
          upper(col("lang")).as("lang_up"),
          length(col("text")).cast(LongType).as("len"),
          instr(col("text"), "join").cast(LongType).as("pos_join"),
          col("text").rlike("batch \\w+ stream").as("prx_match"),
          nullif(regexp_extract(col("text"), "(\\w+) join", 1), lit("")).as("prx_group"),
          levenshtein(element_at(split(col("text"), " "), 1), lit("data")).as("complev"))
        .orderBy(col("doc_id").asc_nulls_first),
    Some("""
      SELECT doc_id,
             substr(text, 1, 12) AS prefix12,
             string_split(text, ' ')[1] AS first_word,
             regexp_replace(text, 'data', 'DATA', 'g') AS tranwrd,
             concat_ws('|', lang, source) AS catx,
             upper(lang) AS lang_up,
             length(text) AS len,
             instr(text, 'join') AS pos_join,
             regexp_matches(text, 'batch \w+ stream') AS prx_match,
             NULLIF(regexp_extract(text, '(\w+) join', 1), '') AS prx_group,
             CAST(levenshtein(string_split(text, ' ')[1], 'data') AS INTEGER) AS complev
      FROM documents
      ORDER BY doc_id ASC NULLS FIRST"""))

  /** op 54 — date/time functions: INTNX → add_months/date_trunc, INTCK →
    * explicit month arithmetic, MDY → make_date, PUT(d,fmt) → date_format,
    * INPUT(s,fmt) → to_date round-trip. Engine quirk handled: Spark
    * dayofweek is 1=Sunday..7, DuckDB's is 0=Sunday..6 (+1 in oracle). */
  private val fnDatetime = GraftQuery(
    "fn_datetime",
    (s, dir) =>
      Tables.orders(s, dir)
        .withColumn("od", col("o_orderdate").cast(DateType))
        .select(
          col("o_orderkey"),
          col("od"),
          add_months(col("od"), 3).as("plus3m"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          ((year(lit("2002-01-01").cast(DateType)) - year(col("od"))) * 12 +
            (month(lit("2002-01-01").cast(DateType)) - month(col("od")))).as("months_to_2002"),
          year(col("od")).as("yr"),
          month(col("od")).as("mo"),
          dayofmonth(col("od")).as("dom"),
          dayofweek(col("od")).as("dow"),
          date_format(col("od"), "yyyy-MM").as("yyyymm"),
          upper(date_format(col("od"), "ddMMMyyyy")).as("sas_date9"),
          to_date(date_format(col("od"), "yyyy-MM-dd"), "yyyy-MM-dd").as("roundtrip"),
          make_date(year(col("od")), month(col("od")), lit(1)).as("mdy_first"))
        .orderBy(col("o_orderkey").asc_nulls_first),
    Some("""
      SELECT o_orderkey,
             CAST(o_orderdate AS DATE) AS od,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
             CAST((2002 - year(o_orderdate)) * 12 + (1 - month(o_orderdate)) AS INTEGER) AS months_to_2002,
             CAST(year(o_orderdate) AS INTEGER) AS yr,
             CAST(month(o_orderdate) AS INTEGER) AS mo,
             CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
             CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
             strftime(o_orderdate, '%Y-%m') AS yyyymm,
             upper(strftime(o_orderdate, '%d%b%Y')) AS sas_date9,
             CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE) AS roundtrip,
             make_date(CAST(year(o_orderdate) AS INTEGER), CAST(month(o_orderdate) AS INTEGER), 1) AS mdy_first
      FROM orders
      ORDER BY o_orderkey ASC NULLS FIRST"""))

  /** op 55 — math + the SAS row-wise SUM(a,b,c): skips missings, all-null
    * → null (≠ SQL `+`, which nulls the whole sum). */
  private val fnMathRowsum = GraftQuery(
    "fn_math_rowsum",
    (s, dir) => {
      val a = nullif(col("l_discount"), lit(0.0))
      val b = nullif(col("l_tax"), lit(0.0))
      val c = col("l_quantity")
      Tables.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * lit(0.0123456789), 2).as("rounded"),
          ceil(col("l_extendedprice")).cast(LongType).as("ceiled"),
          floor(col("l_extendedprice")).cast(LongType).as("floored"),
          abs(col("l_discount") - lit(0.05)).as("absdiff"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          round(exp(col("l_discount")), 6).as("exp_disc"),
          pmod(col("l_quantity").cast(LongType), lit(7L)).as("mod7"),
          when(a.isNull && b.isNull && c.isNull, lit(null).cast(DoubleType))
            .otherwise(coalesce(a, lit(0.0)) + coalesce(b, lit(0.0)) + coalesce(c, lit(0.0)))
            .as("sas_rowsum"))
        .orderBy(col("l_orderkey").asc_nulls_first, col("l_linenumber").asc_nulls_first)
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
             round(l_extendedprice * 0.0123456789, 2) AS rounded,
             CAST(ceil(l_extendedprice) AS BIGINT) AS ceiled,
             CAST(floor(l_extendedprice) AS BIGINT) AS floored,
             abs(l_discount - 0.05) AS absdiff,
             round(ln(l_extendedprice), 6) AS ln_price,
             round(exp(l_discount), 6) AS exp_disc,
             CAST(l_quantity AS BIGINT) % 7 AS mod7,
             CASE WHEN NULLIF(l_discount,0.0) IS NULL AND NULLIF(l_tax,0.0) IS NULL AND l_quantity IS NULL
                  THEN NULL
                  ELSE COALESCE(NULLIF(l_discount,0.0), 0.0) + COALESCE(NULLIF(l_tax,0.0), 0.0) + COALESCE(l_quantity, 0.0)
             END AS sas_rowsum
      FROM lineitem
      ORDER BY l_orderkey ASC NULLS FIRST, l_linenumber ASC NULLS FIRST"""))

  /** op 56 — PUT/INPUT conversions: %.2f formatting (PUT 8.2) and
    * TRY_CAST with bad-value → null (SAS: note + missing). */
  private val fnConvertFormat = GraftQuery(
    "fn_convert_format",
    (s, dir) =>
      Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          format_string("%.2f", col("o_totalprice")).as("price_str"),
          col("o_totalprice").cast(StringType).as("price_raw_str"),
          expr("try_cast(cast(o_totalprice AS STRING) AS DOUBLE)").as("price_back"),
          expr("try_cast(o_orderpriority AS DOUBLE)").as("bad_to_null"),
          expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)").as("prio_num"))
        .orderBy(col("o_orderkey").asc_nulls_first),
    Some("""
      SELECT o_orderkey,
             printf('%.2f', o_totalprice) AS price_str,
             CAST(o_totalprice AS VARCHAR) AS price_raw_str,
             TRY_CAST(CAST(o_totalprice AS VARCHAR) AS DOUBLE) AS price_back,
             TRY_CAST(o_orderpriority AS DOUBLE) AS bad_to_null,
             TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS prio_num
      FROM orders
      ORDER BY o_orderkey ASC NULLS FIRST"""))

  /** op 57 — JSON extraction from the events.props string column. */
  private val fnJsonExtract = GraftQuery(
    "fn_json_extract",
    (s, dir) =>
      Tables.events(s, dir)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k_int"),
          get_json_object(col("props"), "$.missing").as("absent"))
        .orderBy(col("event_id").asc_nulls_first),
    Some("""
      SELECT event_id,
             json_extract_string(props, '$.k') AS k_str,
             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
             json_extract_string(props, '$.missing') AS absent
      FROM events
      ORDER BY event_id ASC NULLS FIRST"""))

  override def queries: Seq[GraftQuery] = Seq(
    fnString, fnDatetime, fnMathRowsum, fnConvertFormat, fnJsonExtract)
}
