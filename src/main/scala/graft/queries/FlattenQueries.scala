package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._
import graft.schema.SchemaInfo

/** Oracle-checked queries exercising the core flatten operator
  * (SURVEY.md §2.3) on the driver tables. Each builds a genuinely
  * nested frame from flat parquet, flattens it back with the library,
  * and is checked against plain relational SQL in DuckDB — nest
  * followed by flatten must round-trip to the flat form, which makes
  * the oracles independent of any UNNEST dialect quirks.
  */
object FlattenQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // nest → flatten round-trip over the PRE-MATERIALIZED nested
    // fixture (Fixtures.nestedLineitem): the timed work is the
    // flatten — Generate+Project over a nested parquet scan — not the
    // fixture's collect_list shuffle
    "flatten_roundtrip" -> ((s, dir) =>
      Flatten.flatten(Fixtures.nestedLineitem(s, dir))),

    // Nest itself measured separately: build the nested frame inline
    // and flatten it back (same oracle as flatten_roundtrip — the
    // round-trip identity)
    "nest_roundtrip" -> ((s, dir) =>
      Flatten.flatten(Fixtures.nestLineitem(s, dir))),

    // two-level nesting: customer → orders[] → items[]; two chained
    // explodes, parents broadcast through both levels
    "flatten_nested2" -> ((s, dir) =>
      Flatten.flatten(Fixtures.nestedOrders2(s, dir))),

    // sibling-array conflict + FlattenAvailable: arrays dropped,
    // scalars kept (nodes.py:344-346)
    "flatten_available" -> ((s, dir) =>
      Flatten.flatten(Fixtures.nestedSiblings(s, dir),
        strategy = FlattenStrategy.FlattenAvailable)),

    // outer join semantics (the reference's unimplemented
    // JoinType.OUTER, nodes.py:326-327): orders with no lineitems
    // survive with null item columns
    "flatten_outer" -> ((s, dir) =>
      Flatten.flatten(Fixtures.nestedOuter(s, dir),
        join = FlattenJoin.Outer)),

    // FlattenExplicit: only the explicitly included array expands;
    // sibling arrays and un-included scalars are dropped entirely
    "flatten_explicit" -> ((s, dir) =>
      Flatten.flatten(Fixtures.nestedSiblings(s, dir),
        strategy = FlattenStrategy.FlattenExplicit,
        include = Seq("l_orderkey", "items"): Seq[String])),

    // dynamic-schema path: JSON props column parsed then flattened
    "flatten_json_props" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k INT")).as("props"))
      Flatten.flatten(ev)
    }),

    // map columns flatten as {key, value} records (the reference's
    // dict-as-list-of-KV emulation, obj.py:69-76)
    "flatten_map" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.IntegerType)).as("props"))
      Flatten.flatten(ev)
    }),

    // name-conflict resolution visible at the output: sibling records
    // with identically-named leaves resolve to parent-prefixed names
    // (nodes.py:218-241 fixpoint)
    "flatten_names" -> ((s, dir) =>
      Flatten.flatten(
        Tables(s, dir, "lineitem").select(
          col("l_orderkey"),
          struct(col("l_quantity").as("v")).as("a"),
          struct(col("l_discount").as("v")).as("b")))),

    // the graft-avro DataSource V2: a deterministic lineitem subset
    // round-trips driver-written Avro -> pruned scan -> DataFrame and
    // must equal the parquet-derived oracle
    "avro_source" -> ((s, dir) => {
      val sample = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey") % 37 === 0)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
      val path = Fixtures.scratch("avro_q")
        .resolve("li.avro").toString
      graft.sources.avro.GraftAvroWriter.write(path, sample.schema,
        sample.collect().toSeq)
      graft.sources.Sources.readAvro(s, path)
    }),

    // Avro MAP columns end-to-end under the gate: a map<string,
    // double> column round-trips writer -> DSv2 pruned scan ->
    // map-explode flatten. A deliberate divergence from the
    // reference, which REJECTS Avro maps (avro_generic.cpp:57-58) —
    // AvroSchemas maps them to Spark MapType and the flatten treats
    // them as KV pairs (obj.py:69-76's dict-as-KV rule).
    "avro_map" -> ((s, dir) => {
      val sample = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey") % 53 === 0)
        .select(col("l_orderkey"),
          map(lit("disc"), col("l_discount"),
            lit("qty"), col("l_quantity")).as("m"))
      val path = Fixtures.scratch("avro_map_q")
        .resolve("li_map.avro").toString
      graft.sources.avro.GraftAvroWriter.write(path, sample.schema,
        sample.collect().toSeq)
      graft.sources.Sources.readAvro(s, path)
        .select(col("l_orderkey"), explode(col("m")).as(Seq("key", "value")))
    }),

    // the wire-level PBD decoder at benchmark scale: the whole
    // lineitem table round-trips through a driver-written PBD
    // container (Fixtures.pbdLineitem, built outside the timed
    // region) and must equal the parquet-derived oracle — this is the
    // row the reference's 200 k rec/s decode bound is judged against
    "pbd_source" -> ((s, dir) =>
      graft.sources.pbd.PbdSource.read(s, Fixtures.pbdLineitem(s, dir))),

    // Arrow IPC round-trip: a deterministic lineitem subset writes to
    // a multi-batch IPC stream on the driver and reads back through
    // the batch-parallel source — closing the one reference source
    // that was pinned by ScalaTest alone (arrow.cpp:289-326)
    "arrow_source" -> ((s, dir) => {
      val sample = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey") % 47 === 0)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
      val path = Fixtures.scratch("arrow_q")
        .resolve("li.arrows").toString
      // small batches force the multi-batch read path
      graft.sources.ArrowSource.toArrowStream(sample, path, batchRows = 256)
      graft.sources.ArrowSource.fromArrowStream(s, path)
    }),

    // ORC round-trip: the second columnar storage format (Spark
    // built-in), same deterministic-subset pattern as avro_source
    "orc_source" -> ((s, dir) => {
      val sample = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey") % 41 === 0)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
      val path = Fixtures.scratch("orc_q")
        .resolve("li.orc").toString
      sample.write.mode("overwrite").orc(path)
      s.read.orc(path)
    }),

    // CSV round-trip: the text format path (explicit read schema —
    // CSV carries none), same deterministic-subset pattern
    "csv_source" -> ((s, dir) => {
      val sample = Tables(s, dir, "lineitem")
        .filter(col("l_orderkey") % 43 === 0)
        .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
      val path = Fixtures.scratch("csv_q")
        .resolve("li.csv").toString
      sample.write.mode("overwrite").option("header", "true").csv(path)
      s.read.option("header", "true")
        .schema("l_orderkey BIGINT, l_partkey BIGINT, l_quantity DOUBLE, l_returnflag STRING")
        .csv(path)
    }),

    // WARC round-trip: the web-crawl container format (ISO 28500) —
    // spec-shaped response records (per-partition warcinfo preamble,
    // exact Content-Length framing) written from a deterministic
    // documents subset carrying the shared synthetic HTML page, read
    // back with the splittable delimited-text path and parsed at
    // scan speed. The oracle recomputes url/status/mime/chars from
    // the parquet table, so any framing or parse drift fails the
    // gate.
    "warc_source" -> ((s, dir) => {
      val sample = Tables(s, dir, "documents")
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"),
          concat(lit("https://site"), (col("doc_id") % 7).cast("string"),
            lit(".example.net/doc/"), col("doc_id").cast("string"))
            .as("uri"),
          TextQueries.synthHtml.as("html"))
        .repartition(4)
      val path = Fixtures.scratch("warc_q").resolve("docs.warc").toString
      graft.sources.WarcSource.toWarc(sample, "uri", "html", path)
      graft.sources.WarcSource.fromWarc(s, path)
        .select(
          regexp_extract(col("url"), "/doc/([0-9]+)$", 1).cast("long")
            .as("doc_id"),
          col("url"), col("http_status"), col("mime"),
          length(col("html")).cast("long").as("n_chars"))
    }),

    // schema introspection golden: info() rendering of the nested
    // schema, checked against a literal oracle
    "schema_info" -> ((s, dir) => {
      import s.implicits._
      val rendered = SchemaInfo.render(Fixtures.nestedLineitem(s, dir).schema)
      rendered.split("\n").toSeq.zipWithIndex
        .map { case (l, i) => (i.toLong, l) }
        .toDF("idx", "line")
    })
  )

  val oracles: Map[String, String] = Map(
    "flatten_roundtrip" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    "nest_roundtrip" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    "flatten_nested2" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, l_linenumber, l_quantity
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin,
    "flatten_available" ->
      "SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY l_orderkey",
    "flatten_outer" ->
      """SELECT o_orderkey, l_linenumber, l_quantity
        |FROM orders LEFT JOIN lineitem ON l_orderkey = o_orderkey""".stripMargin,
    "flatten_explicit" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
    "flatten_json_props" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events""".stripMargin,
    "flatten_map" ->
      """SELECT event_id, 'k' AS key,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS value
        |FROM events""".stripMargin,
    "avro_source" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_returnflag
        |FROM lineitem WHERE l_orderkey % 37 = 0""".stripMargin,
    "avro_map" ->
      """SELECT l_orderkey, 'disc' AS key, l_discount AS value
        |FROM lineitem WHERE l_orderkey % 53 = 0
        |UNION ALL
        |SELECT l_orderkey, 'qty' AS key, l_quantity AS value
        |FROM lineitem WHERE l_orderkey % 53 = 0""".stripMargin,
    "pbd_source" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_returnflag
        |FROM lineitem""".stripMargin,
    "arrow_source" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_returnflag
        |FROM lineitem WHERE l_orderkey % 47 = 0""".stripMargin,
    "orc_source" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_returnflag
        |FROM lineitem WHERE l_orderkey % 41 = 0""".stripMargin,
    "csv_source" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_returnflag
        |FROM lineitem WHERE l_orderkey % 43 = 0""".stripMargin,
    "warc_source" ->
      (TextQueries.htmlBlocksCte +
        """
          |SELECT doc_id,
          |  'https://site' || CAST(doc_id % 7 AS VARCHAR) ||
          |    '.example.net/doc/' || CAST(doc_id AS VARCHAR) AS url,
          |  CAST(200 AS INTEGER) AS http_status,
          |  'text/html' AS mime,
          |  CAST(length(html) AS BIGINT) AS n_chars
          |FROM h WHERE doc_id % 5 = 0""".stripMargin),
    "flatten_names" ->
      """SELECT l_orderkey, l_quantity AS a_v, l_discount AS b_v
        |FROM lineitem""".stripMargin,
    "schema_info" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), '- l_orderkey int64'),
        |  (CAST(1 AS BIGINT), '- items []'),
        |  (CAST(2 AS BIGINT), '    - l_linenumber int32'),
        |  (CAST(3 AS BIGINT), '    - l_quantity float64')) t(idx, line)""".stripMargin
  )
}
