package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Scalar-function surface (SURVEY.md §2.7) + the semi-structured
  * ingestion patterns (S2/S6, §1.4): string/date/math builtins, URL
  * parsing, haversine geo distance (P6's GeoJSON point, §7.3), HTML
  * field extraction by regex (the reference's CSS-selector scans made
  * declarative), and the two-dialect embedded-JSON dispatch
  * (posts-from-hashtags.js:121-122 — `graphql` vs `data` shapes of the
  * same logical record, unified with from_json + coalesce).
  */
object Scalars extends graft.QueryPack {

  /** Dialect-A/B JSON payloads derived deterministically from orders —
    * same construction in the oracle, so parsing is fully checked. */
  private def jsonPayload = concat(
    when(col("o_orderkey") % 2 === 0,
      concat(lit("""{"graphql":{"post":{"id":"p"""), col("o_orderkey"),
        lit("\",\"like_count\":"), col("o_custkey"), lit("}}}")))
      .otherwise(
        concat(lit("""{"data":{"media":{"pk":"p"""), col("o_orderkey"),
          lit("\",\"likes\":"), col("o_custkey"), lit("}}}"))))

  private val schemaA = StructType(Seq(StructField("graphql", StructType(Seq(
    StructField("post", StructType(Seq(
      StructField("id", StringType), StructField("like_count", LongType)))))))))
  private val schemaB = StructType(Seq(StructField("data", StructType(Seq(
    StructField("media", StructType(Seq(
      StructField("pk", StringType), StructField("likes", LongType)))))))))

  /** The planted 3-dialect JSON column for the schema-drift audit
    * pair (q_schema_drift / q_stream_schema_drift): three producer
    * generations of the same event payload, with the drift classes a
    * raw feed actually exhibits — a TYPE CHANGE (`user` ships as a
    * number in dialects 0/2 and as a string in dialect 1), a NULLED
    * field (`amount`/`tag` present-but-null), and an ADDED field
    * (`extra` only in dialect 1). Built with to_json from the same
    * event row the audit reads, so the oracle restates every count in
    * closed form from event_id % 3 — the q_dom_extract analytic-oracle
    * device (expected values derived from the row key, never from
    * another parser). `amount` rides a DECIMAL(12,2) so its JSON
    * rendering is plain fixed-point (a raw double could serialize
    * scientific and misclassify). */
  private[operators] def dialectJson: org.apache.spark.sql.Column = {
    val keepNulls = Map("ignoreNullFields" -> "false")
    when(col("event_id") % 3 === 0,
      to_json(struct(col("user_id").as("user"),
        col("value").cast(DecimalType(12, 2)).as("amount"),
        col("event_type").as("tag")), keepNulls))
      .when(col("event_id") % 3 === 1,
        to_json(struct(col("user_id").cast("string").as("user"),
          lit(null).cast("double").as("amount"), lit(true).as("extra")),
          keepNulls))
      .otherwise(
        to_json(struct(col("user_id").as("user"),
          lit(null).cast("string").as("tag")), keepNulls))
  }

  /** Audited key set — the DECLARED schema the raw feed is validated
    * against (schema-drift audits check a contract, not discovery). */
  private[operators] val schemaKeys = Seq("amount", "extra", "tag", "user")

  /** Per-row (key, jtype) cells from the raw JSON TEXT: presence by
    * `"key":` containment, type by value-shape regex (quoted → string,
    * null/true/false literals, integer vs fixed-point number) — all
    * in the RE2∩Java common subset, identical in DuckDB, and reliable
    * because the planted payloads contain no escapes or embedded
    * commas. One narrow projection + explode; no parser state. Shared
    * by the batch audit and the streaming fold (one definition, two
    * paths). */
  private[operators] def schemaCells(ev: DataFrame): DataFrame = {
    val withJ = ev.select(dialectJson.as("j"))
    val cells = schemaKeys.map { k =>
      val present = col("j").contains(s""""$k":""")
      val v = regexp_extract(col("j"), s""""$k":(("[^"]*")|[^,}]+)""", 1)
      val t = when(!present, lit(null).cast("string"))
        .when(v === "null", "null")
        .when(v.isin("true", "false"), "boolean")
        .when(v.rlike("^-?[0-9]+$"), "bigint")
        .when(v.rlike("^-?[0-9]+\\.[0-9]+$"), "double")
        .otherwise("string")
      struct(lit(k).as("key"), t.as("jtype"))
    }
    withJ.select(explode(array(cells: _*)).as("c"))
      .select(col("c.key").as("key"), col("c.jtype").as("jtype"))
      .filter(col("jtype").isNotNull)
  }

  /** The audit report over (key, jtype, n) counts — per declared key:
    * presence/missing/null tallies, the per-type histogram, the
    * dominant non-null type (struct-max tie: higher count, then the
    * lexicographically LARGER type name — restated in the oracle) and
    * the conflict flag (≥2 distinct non-null types = the producer
    * fleet disagrees). Total rows come from the `user` key, present
    * in every dialect by construction. Grid-sized everywhere. */
  private[operators] def schemaReport(counts: DataFrame): DataFrame = {
    val total = counts.filter(col("key") === "user")
      .agg(sum(col("n")).as("total"))
    counts.groupBy(col("key"))
      .agg(sum(col("n")).as("n_present"),
        sum(when(col("jtype") === "null", col("n")).otherwise(0L)).as("n_null"),
        sum(when(col("jtype") === "bigint", col("n")).otherwise(0L)).as("n_bigint"),
        sum(when(col("jtype") === "double", col("n")).otherwise(0L)).as("n_double"),
        sum(when(col("jtype") === "boolean", col("n")).otherwise(0L)).as("n_boolean"),
        sum(when(col("jtype") === "string", col("n")).otherwise(0L)).as("n_string"),
        max(when(col("jtype") =!= "null", struct(col("n"), col("jtype"))))
          .as("dom"),
        count(when(col("jtype") =!= "null", lit(1))).as("n_types"))
      .crossJoin(broadcast(total))
      .select(col("key"), col("n_present"),
        (col("total") - col("n_present")).as("n_missing"),
        col("n_null"), col("n_bigint"), col("n_double"),
        col("n_boolean"), col("n_string"),
        col("dom.jtype").as("dominant_type"),
        (col("n_types") > 1L).as("type_conflict"))
      .orderBy(col("key"))
  }

  /** Recursive selector fallback (S6, news/elimparcial.js:49-60
    * `getContentFromSelectors`): try selectors in ORDER; the first one
    * with >= 1 match wins and contributes ALL of its matches; later
    * selectors are ignored even if they also match. Selectors are
    * regexes with one capture group (the declarative stand-in for CSS
    * selectors); evaluation is a pure per-row projection — codegen'd
    * regexp_extract_all + coalesce, no UDF, no shuffle. */
  def selectorFallback(html: org.apache.spark.sql.Column,
      selectors: Seq[String]): org.apache.spark.sql.Column = {
    val attempts = selectors.map { p =>
      val m = regexp_extract_all(html, lit(p), lit(1))
      when(size(m) > 0, m)
    }
    coalesce(attempts :+ array().cast("array<string>"): _*)
  }

  /** DOM-fidelity extraction (functions/HtmlDom.scala): real tag
    * tokenizer + element tree, so attribute reorder, mixed quoting,
    * nested same-class tags, implied closes and descendant selectors
    * all behave as jsdom does — closing the "first messy real page
    * breaks the regex" gap. UDFs, deliberately: extraction is an
    * ingest-side per-row map (never a shuffle key or a join input);
    * the downstream analytics stay codegen. Golden-fixtured in
    * HtmlDomSpec; oracle-gated through q_dom_extract. */
  private val domTexts =
    udf((html: String, sel: String) => graft.functions.HtmlDom.selectTexts(html, sel))
  private val domAttrs =
    udf((html: String, sel: String, attr: String) =>
      graft.functions.HtmlDom.selectAttrs(html, sel, attr))
  private val domFallback =
    udf((html: String, sels: Seq[String]) =>
      graft.functions.HtmlDom.selectorFallbackTexts(html, sels))
  private val domHtmls =
    udf((html: String, sel: String) =>
      graft.functions.HtmlDom.selectHtmls(html, sel))

  /** CSS-selector forms of the three extraction surfaces. */
  def domSelectTexts(html: org.apache.spark.sql.Column, selector: String)
      : org.apache.spark.sql.Column = domTexts(html, lit(selector))
  def domSelectAttrs(html: org.apache.spark.sql.Column, selector: String,
      attr: String): org.apache.spark.sql.Column =
    domAttrs(html, lit(selector), lit(attr))
  def domSelectorFallback(html: org.apache.spark.sql.Column,
      selectors: Seq[String]): org.apache.spark.sql.Column =
    domFallback(html, array(selectors.map(lit): _*))
  def domSelectHtmls(html: org.apache.spark.sql.Column, selector: String)
      : org.apache.spark.sql.Column = domHtmls(html, lit(selector))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Point-in-polygon geofencing — the other spatial primitive next
    // to q_geo_knn's nearest-neighbor join: which customers fall in
    // which CONVEX fence. Convexity makes the test EXACT INTEGER
    // arithmetic: a point is inside a CCW polygon iff every edge's
    // cross product (x2−x1)(py−y1) − (y2−y1)(px−x1) is ≥ 0 — no ray
    // casting division, no float epsilon, engine-identical by
    // construction. The fence set is a broadcast literal edge table
    // (constant ×|edges| fan-out per point — the geo_knn probe
    // pattern), membership is one (point, fence) min-cross
    // aggregation, and the output is the fence summary grid.
    // Coordinates are the same integer key derivation the geo family
    // shares (restated in the oracle).
    "q_geo_fence" -> ((s, d) => {
      // CCW convex fences as (fence, x1, y1, x2, y2) edge rows
      val fences = Seq(
        ("tri_equator", Seq((0L, 0L), (60L, 0L), (30L, 50L))),
        ("w_square", Seq((-150L, -75L), (-100L, -75L), (-100L, -25L),
          (-150L, -25L))),
        ("ne_square", Seq((100L, 10L), (160L, 10L), (160L, 70L),
          (100L, 70L))))
      val edges = fences.flatMap { case (f, vs) =>
        vs.zip(vs.tail :+ vs.head).map { case ((x1, y1), (x2, y2)) =>
          (f, x1, y1, x2, y2)
        }
      }
      val edgeDf = s.createDataFrame(edges)
        .toDF("fence", "x1", "y1", "x2", "y2")
      val pts = Tables(s, d, "customer").select(col("c_custkey"),
        (col("c_custkey") % 350 - 175).as("px"),
        (col("c_custkey") % 170 - 85).as("py"))
      pts.crossJoin(broadcast(edgeDf))
        .withColumn("cross",
          (col("x2") - col("x1")) * (col("py") - col("y1")) -
            (col("y2") - col("y1")) * (col("px") - col("x1")))
        .groupBy(col("fence"), col("c_custkey"))
        .agg(min(col("cross")).as("mincross"))
        .groupBy(col("fence"))
        .agg(count(lit(1)).as("n_points"),
          sum(when(col("mincross") >= 0, 1L).otherwise(0L)).as("n_inside"),
          sum(when(col("mincross") === 0, 1L).otherwise(0L))
            .as("n_boundary"))
        .withColumn("share", round(col("n_inside").cast("double") /
          col("n_points").cast("double"), 6))
        .orderBy(col("fence"))
    }),

    // §2.7 string/date/number builtins in one projection.
    "q_scalar_funcs" -> ((s, d) => {
      Tables(s, d, "orders").select(
        col("o_orderkey"),
        concat(lit("ORD-"), lpad(col("o_orderkey").cast("string"), 10, "0")).as("order_code"),
        substring(col("o_orderpriority"), 1, 1).cast("long").as("prio_rank"),
        replace(col("o_orderpriority"), lit("-"), lit("_")).as("prio_snake"),
        upper(col("o_orderstatus")).as("status_u"),
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        datediff(col("o_orderdate"), lit("2020-01-01").cast("date")).cast("long").as("days_since"),
        (col("o_orderkey") % 7).as("mod7"),
        pow(lit(2), col("o_orderkey") % 10).as("pow2"),
        greatest(col("o_totalprice"), lit(50000.0)).as("floor_price"))
        .orderBy(col("o_orderkey"))
    }),

    // URL construction + parsing (S4's url building, parse_url).
    "q_url_extract" -> ((s, d) => {
      Tables(s, d, "orders")
        .withColumn("url", concat(lit("https://posts.example.com/p/"),
          col("o_orderkey"), lit("?src="), lower(col("o_orderstatus"))))
        .select(
          col("o_orderkey"), col("url"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("src")).as("src_param"))
        .orderBy(col("o_orderkey"))
    }),

    // URL canonicalization: the web-pipeline normalization op (dedup by
    // canonical URL). Derived messy URLs (mixed-case host, default
    // port, tracking params, fragments, trailing slash) are normalized
    // with regex steps written to the RE2∩Java-regex common subset; the
    // query-param filter drops utm_* while preserving order. Pure
    // codegen'd projections, no shuffle.
    "q_url_canonical" -> ((s, d) => {
      val url = concat(lit("HTTPS://Posts.Example.COM:443/p/"), col("o_orderkey"),
        when(col("o_orderkey") % 2 === 0, "/").otherwise(""),
        lit("?utm_source=ig&id="), col("o_custkey"), lit("&utm_campaign=x"),
        when(col("o_orderkey") % 3 === 0, "#frag").otherwise(""))
      Tables(s, d, "orders")
        .withColumn("url", url)
        .withColumn("nofrag", regexp_replace(col("url"), "#.*$", ""))
        .withColumn("proto",
          lower(regexp_extract(col("nofrag"), "^([a-zA-Z]+)://", 1)))
        .withColumn("host", regexp_replace(
          lower(regexp_extract(col("nofrag"), "^[a-zA-Z]+://([^/?#]+)", 1)),
          ":443$", ""))
        .withColumn("path", regexp_replace(
          regexp_extract(col("nofrag"), "^[a-zA-Z]+://[^/?#]+([^?#]*)", 1),
          "/$", ""))
        .withColumn("q", regexp_extract(col("nofrag"), "\\?(.*)$", 1))
        .withColumn("kept", array_join(
          filter(split(col("q"), "&"), p => !p.startsWith("utm_")), "&"))
        .select(col("o_orderkey"), col("url"),
          concat(col("proto"), lit("://"), col("host"), col("path"),
            when(length(col("kept")) > 0, concat(lit("?"), col("kept")))
              .otherwise(lit(""))).as("canonical"))
        .orderBy(col("o_orderkey"))
    }),

    // Haversine distance from a derived GeoJSON-style point to a fixed
    // point (reference stores gps [lng, lat], models.js:21-24; it never
    // queries geo, so the distance op is our generalization).
    "q_geo_haversine" -> ((s, d) => {
      val lat = (col("c_custkey") % 170).cast("double") - 85.0
      val lng = (col("c_custkey") % 350).cast("double") - 175.0
      val lat0 = radians(lit(19.4326)); val lng0 = radians(lit(-99.1332))
      val rlat = radians(lat); val rlng = radians(lng)
      val a = pow(sin((rlat - lat0) / 2), 2) +
        cos(lat0) * cos(rlat) * pow(sin((rlng - lng0) / 2), 2)
      val dist = lit(2 * 6371.0) * atan2(sqrt(a), sqrt(lit(1.0) - a))
      Tables(s, d, "customer").select(
        col("c_custkey"), lat.as("lat"), lng.as("lng"),
        round(dist, 6).as("dist_km"))
        .orderBy(col("c_custkey"))
    }),

    // Geohash-bucketed spatial kNN join — the generalization of the
    // reference's DECLARED-but-unused 2dsphere index (models.js:21-34:
    // it indexes location.gps yet never issues a geo query). Nearest-3
    // locations (derived from supplier) per query point (derived from
    // customer): each point probes its 10°-grid cell plus the 8
    // neighbors (explode over a 9-element constant array), candidates
    // arrive through a hash EQUI-JOIN on the integer cell key — never
    // a cross product (PlanShapeSpec pins it) — then exact haversine
    // verifies and row_number keeps the top 3. At 100 TB this is the
    // standard spatial-join layout: work ∝ cell occupancy, the cell
    // size is the knob that keeps occupancy constant as density grows,
    // and a hotspot cell is an AQE skew-split, not a plan change.
    // (No ±180° longitude wrap probes — the derived grid stops short
    // of the dateline; a production deployment adds two wrap probes.)
    "q_geo_knn" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val loc = Tables(s, d, "supplier").select(col("s_suppkey"),
        ((col("s_suppkey") * 7 % 170).cast("double") - 85.0).as("llat"),
        ((col("s_suppkey") * 13 % 350).cast("double") - 175.0).as("llng"))
        .withColumn("cla", floor(col("llat") / 10.0).cast("long"))
        .withColumn("clo", floor(col("llng") / 10.0).cast("long"))
      val pt = Tables(s, d, "customer").select(col("c_custkey"),
        ((col("c_custkey") % 170).cast("double") - 85.0).as("plat"),
        ((col("c_custkey") % 350).cast("double") - 175.0).as("plng"))
      val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
        yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)
      val probes = pt
        .withColumn("o", explode(offsets))
        .select(col("c_custkey"), col("plat"), col("plng"),
          (floor(col("plat") / 10.0).cast("long") + col("o.dx")).as("cla"),
          (floor(col("plng") / 10.0).cast("long") + col("o.dy")).as("clo"))
      val rlat0 = radians(col("plat")); val rlat1 = radians(col("llat"))
      val a = pow(sin((rlat1 - rlat0) / 2), 2) +
        cos(rlat0) * cos(rlat1) *
          pow(sin((radians(col("llng")) - radians(col("plng"))) / 2), 2)
      val dist = lit(2 * 6371.0) * atan2(sqrt(a), sqrt(lit(1.0) - a))
      val w = Window.partitionBy(col("c_custkey"))
        .orderBy(col("dist_km"), col("s_suppkey"))
      probes.join(loc, Seq("cla", "clo"))
        .withColumn("dist_km", round(dist, 6))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("c_custkey"), col("rnk"), col("s_suppkey"), col("dist_km"))
        .orderBy(col("c_custkey"), col("rnk"))
    }),

    // HTML field extraction (S6/P8: .news--box scan + relative image
    // URL absolutization, news/elimparcial.js:11-47) — now through the
    // DOM engine: attribute reads on the a/img elements instead of
    // position-sensitive regexes. Same fixture HTML, same output, same
    // oracle; HtmlDomSpec covers the messy shapes the fixture can't.
    "q_html_extract" -> ((s, d) => {
      val html = concat(
        lit("""<div class="news--box"><a title=""""), col("c_name"),
        lit("""" href="/n/"""), col("c_custkey"), lit(""""><img src=""""),
        when(col("c_custkey") % 2 === 0, lit("https://cdn.example.com/i.jpg"))
          .otherwise(lit("/static/i.jpg")),
        lit(""""></a></div>"""))
      val src = try_element_at(
        domSelectAttrs(col("html"), ".news--box img", "src"), lit(1))
      Tables(s, d, "customer")
        .withColumn("html", html)
        .select(
          col("c_custkey"),
          try_element_at(domSelectAttrs(col("html"), ".news--box a", "title"),
            lit(1)).as("title"),
          try_element_at(domSelectAttrs(col("html"), ".news--box a", "href"),
            lit(1)).as("href"),
          when(src.startsWith("http"), src)
            .otherwise(concat(lit("https://news.example.com"), src))
            .as("image_abs"))
        .orderBy(col("c_custkey"))
    }),

    // S6 recursive selector fallback (news/elimparcial.js:49-60): the
    // general N-selector list, not just a 2-way coalesce. Derived HTML
    // gives each row one of three shapes; rows with a headline ALSO
    // carry a fallback paragraph, proving the priority order (an
    // earlier selector's match suppresses later ones), and every third
    // title row carries TWO title matches, proving the winning selector
    // returns all its matches, not the first.
    "q_selector_fallback" -> ((s, d) => {
      val k = col("c_custkey")
      val html = concat(lit("<body>"),
        when(k % 3 === 0, concat(
          lit("""<h1 class="title">T"""), k, lit("</h1>"),
          when(k % 6 === 0,
            concat(lit("""<h1 class="title">U"""), k, lit("</h1>")))
            .otherwise(lit("")))).otherwise(lit("")),
        when(k % 3 === 1, concat(
          lit("""<div class="headline">H"""), k, lit("</div>"),
          lit("""<p class="fallback">F"""), k, lit("</p>")))
          .otherwise(lit("")),
        when(k % 3 === 2,
          concat(lit("""<p class="fallback">P"""), k, lit("</p>")))
          .otherwise(lit("")),
        lit("</body>"))
      // CSS selectors through the DOM engine (was: capture-group
      // regexes) — the reference's actual selector forms
      val sels = Seq("h1.title", "div.headline", "p.fallback")
      val m = domSelectorFallback(col("html"), sels)
      val winner = sels.zipWithIndex.foldRight(lit(0L)) { case ((p, i), rest) =>
        when(size(domSelectTexts(col("html"), p)) > 0,
          lit((i + 1).toLong)).otherwise(rest)
      }
      Tables(s, d, "customer")
        .withColumn("html", html)
        .select(col("c_custkey"),
          winner.as("matched_selector"),
          size(m).cast("long").as("n_matches"),
          try_element_at(m, lit(1)).as("first_match"))
        .orderBy(col("c_custkey"))
    }),

    // The eldolar rate-table scan (S6/P7, dolar/eldolar.js:17-36),
    // re-expressed faithfully: querySelectorAll('#dllsTable tbody tr')
    // yields ROW FRAGMENTS whose innerHTML is re-parsed per row and
    // sub-selected (the reference wraps each fragment in a fresh
    // JSDOM) — entity from the anchor's first child's title, url from
    // href with the protocol-relative '//' stripped, buy from the
    // first .xTimes cell, sell from the second WITH the reference's
    // fallback to buy when a row has only one cell. The generated
    // table varies row count (2-3) and cell count per row, so the
    // fallback branch is non-vacuous; the oracle derives everything
    // analytically from (c_custkey, row_no).
    "q_dom_table" -> ((s, d) => {
      val k = col("c_custkey")
      def tr(j: Int) = concat(
        lit(s"""<tr><td><a href="//bank"""), k, lit(s"-$j"),
        lit(""".example.com/mx"><span title="Bank """), k, lit(s"-$j"),
        lit("""">B</span></a></td><td class="xTimes">1"""), lit(j),
        lit("."), k % 10, lit("0</td>"),
        when((k + j) % 3 =!= 0, concat(
          lit("""<td class="xTimes">2"""), lit(j), lit("."), k % 10,
          lit("5</td>"))).otherwise(lit("")),
        lit("</tr>"))
      val html = concat(
        lit("""<table id="dllsTable"><tbody>"""), tr(0), tr(1),
        when(k % 2 === 1, tr(2)).otherwise(lit("")),
        lit("</tbody></table>"))
      val buyCells = domSelectTexts(col("frag"), ".xTimes")
      Tables(s, d, "customer")
        .withColumn("html", html)
        .select(col("c_custkey"),
          posexplode(domSelectHtmls(col("html"), "#dllsTable tbody tr")))
        .withColumnRenamed("pos", "row_no")
        .withColumnRenamed("col", "frag")
        .select(col("c_custkey"), col("row_no").cast("long").as("row_no"),
          try_element_at(domSelectAttrs(col("frag"), "a span", "title"),
            lit(1)).as("entity"),
          regexp_replace(
            try_element_at(domSelectAttrs(col("frag"), "a", "href"), lit(1)),
            "^//", "").as("url"),
          try_element_at(buyCells, lit(1)).as("buy"),
          coalesce(try_element_at(buyCells, lit(2)),
            try_element_at(buyCells, lit(1))).as("sell"))
        .orderBy(col("c_custkey"), col("row_no"))
    }),

    // K6 alert-row generation (support/email.js:15-21): page sentinels
    // map to alert codes in the reference's check order — a row with
    // multiple sentinels takes the FIRST (is-login-required runs
    // before login's two checks), clean pages emit nothing. Derived
    // page text plants all three sentinels plus a priority-collision
    // row; the alert table is the emailable artifact (transport = the
    // offline boundary, as S3 is for ObjectSink). Map-side CASE chain;
    // the filter prunes clean rows before the presentation sort.
    "q_alert_rows" -> ((s, d) => {
      val k = col("c_custkey")
      val page = concat(lit("<html><body>"),
        when(k % 7 === 0, lit("Login • Instagram"))
          .when(k % 7 === 1, lit("Suspicious Login Attempt"))
          .when(k % 7 === 2, lit("Your Account Has Been Temporarily Locked"))
          .when(k % 7 === 3,
            lit("Suspicious Login Attempt ... Login • Instagram"))
          .otherwise(lit("feed")),
        lit("</body></html>"))
      Tables(s, d, "customer")
        .withColumn("alert",
          graft.streaming.AlertSink.alertFor(page))
        .filter(col("alert").isNotNull)
        .select(col("c_custkey"), col("alert"))
        .orderBy(col("c_custkey"))
    }),

    // DOM-fidelity extraction gate (S6/P8/P9): per-row HTML in THREE
    // deliberately messy shapes — nested same-class boxes, reordered
    // single-quoted attributes, unquoted values with a bare attribute
    // in between — all of which break position-sensitive regexes, all
    // parsed by the HtmlDom engine (dataset-style data-* reads +
    // innerText through nested markup, the elimparcial.js:31-38
    // button.dataset pattern). The HTML is a deterministic function of
    // the row key, so the DuckDB oracle derives the EXPECTED values
    // analytically — the oracle checks the parser without needing one.
    "q_dom_extract" -> ((s, d) => {
      val k = col("c_custkey")
      val btn = concat(lit("Go <b>"), k, lit("</b>"))
      val html =
        when(k % 3 === 0, concat(
          lit("""<div class="news--box"><div class="news--box inner">"""),
          lit("""<button data-url=/n/"""), k,
          lit(""" data-title=""""), col("c_name"), lit("""" disabled>"""),
          btn, lit("</button></div></div>")))
        .when(k % 3 === 1, concat(
          lit("""<div data-k=""""), k, lit("""" class='news--box'>"""),
          lit("""<button data-title='"""), col("c_name"),
          lit("""' data-url="/n/"""), k, lit("""">"""),
          btn, lit("</button></div>")))
        .otherwise(concat(
          lit("""<div class=news--box><button disabled data-url=/n/"""), k,
          lit(""" data-title=""""), col("c_name"), lit("""">"""),
          btn, lit("</button></div>")))
      Tables(s, d, "customer")
        .withColumn("html", html)
        .select(
          col("c_custkey"),
          try_element_at(domSelectAttrs(col("html"), ".news--box button",
            "data-title"), lit(1)).as("title"),
          try_element_at(domSelectAttrs(col("html"), ".news--box button",
            "data-url"), lit(1)).as("url"),
          size(domSelectTexts(col("html"), ".news--box")).cast("long")
            .as("n_box"),
          try_element_at(domSelectTexts(col("html"), "button"), lit(1))
            .as("label"))
        .orderBy(col("c_custkey"))
    }),

    // Dead-letter routing (F3/K5): rows whose payload fails to parse go
    // to the 'dead' channel instead of poisoning the pipeline. Corrupt
    // payloads derived deterministically (odd event_ids get trailing
    // garbage).
    "q_deadletter_json" -> ((s, d) => {
      val kSchema = StructType(Seq(StructField("k", LongType)))
      Tables(s, d, "events")
        // truncation (not trailing garbage — Spark's Jackson tolerates
        // that) so both engines agree the payload is invalid
        .withColumn("js", when(col("event_id") % 2 === 1,
          substring(col("props"), lit(1), length(col("props")) - 2))
          .otherwise(col("props")))
        .withColumn("parsed", from_json(col("js"), kSchema))
        .select(col("event_id"),
          when(col("parsed").isNotNull && col("parsed.k").isNotNull, "ok")
            .otherwise("dead").as("channel"),
          col("parsed.k").as("k"))
        .orderBy(col("event_id"))
    }),

    // Two-dialect embedded-JSON dispatch: from_json with both schemas,
    // coalesce the projections (S2, §1.4).
    "q_json_dialect" -> ((s, d) => {
      Tables(s, d, "orders")
        .withColumn("js", jsonPayload)
        .withColumn("a", from_json(col("js"), schemaA))
        .withColumn("b", from_json(col("js"), schemaB))
        .select(
          col("o_orderkey"),
          coalesce(col("a.graphql.post.id"), col("b.data.media.pk")).as("post_id"),
          coalesce(col("a.graphql.post.like_count"), col("b.data.media.likes")).as("likes"),
          when(col("a.graphql").isNotNull, "graphql").otherwise("data").as("dialect"))
        .orderBy(col("o_orderkey"))
    }),

    // Schema-drift audit over the planted 3-dialect raw feed
    // ([[dialectJson]]): per declared key, presence/missing/null
    // tallies, the per-type histogram, the dominant type and the
    // conflict flag — the validation report an ingestion pipeline
    // runs BEFORE from_json hard-codes a schema (q_json_dialect's
    // dispatch assumes the dialects are known; this is how they get
    // discovered when a producer drifts). One narrow cell projection
    // + one (key × type) grid agg; grid-sized everywhere after.
    "q_schema_drift" -> ((s, d) => {
      val counts = schemaCells(Tables(s, d, "events"))
        .groupBy(col("key"), col("jtype")).agg(count(lit(1)).as("n"))
      schemaReport(counts)
    })
  )

  def oracles: Map[String, String] = Map(
    // the analytic closed form: every tally derives from event_id % 3
    // (the plant is a pure function of the row key), so the oracle
    // never parses JSON — if the Spark side's regex classifier drifts
    // from the plant, the hash breaks
    "q_schema_drift" ->
      """WITH c AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c0,
        |    CAST(SUM(CASE WHEN event_id % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c1,
        |    CAST(SUM(CASE WHEN event_id % 3 = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c2,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events),
        |r AS (
        |  SELECT 'amount' AS key, c0 + c1 AS n_present,
        |    n - (c0 + c1) AS n_missing, c1 AS n_null, 0 AS n_bigint,
        |    c0 AS n_double, 0 AS n_boolean, 0 AS n_string,
        |    CASE WHEN c0 > 0 THEN 'double' END AS dominant_type,
        |    false AS type_conflict
        |  FROM c
        |  UNION ALL
        |  SELECT 'extra', c1, n - c1, 0, 0, 0, c1, 0,
        |    CASE WHEN c1 > 0 THEN 'boolean' END, false FROM c
        |  UNION ALL
        |  SELECT 'tag', c0 + c2, n - (c0 + c2), c2, 0, 0, 0, c0,
        |    CASE WHEN c0 > 0 THEN 'string' END, false FROM c
        |  UNION ALL
        |  SELECT 'user', n, 0, 0, c0 + c2, 0, 0, c1,
        |    CASE WHEN c0 + c2 = 0 AND c1 = 0 THEN NULL
        |         WHEN c0 + c2 > c1 THEN 'bigint' ELSE 'string' END,
        |    c0 + c2 > 0 AND c1 > 0 FROM c)
        |SELECT key, CAST(n_present AS BIGINT) AS n_present,
        |  CAST(n_missing AS BIGINT) AS n_missing,
        |  CAST(n_null AS BIGINT) AS n_null,
        |  CAST(n_bigint AS BIGINT) AS n_bigint,
        |  CAST(n_double AS BIGINT) AS n_double,
        |  CAST(n_boolean AS BIGINT) AS n_boolean,
        |  CAST(n_string AS BIGINT) AS n_string,
        |  dominant_type, type_conflict
        |FROM r WHERE n_present > 0 ORDER BY key""".stripMargin,

    // same CCW edges, same integer cross-product membership
    "q_geo_fence" ->
      """WITH edges(fence, x1, y1, x2, y2) AS (VALUES
        |  ('tri_equator', 0, 0, 60, 0),
        |  ('tri_equator', 60, 0, 30, 50),
        |  ('tri_equator', 30, 50, 0, 0),
        |  ('w_square', -150, -75, -100, -75),
        |  ('w_square', -100, -75, -100, -25),
        |  ('w_square', -100, -25, -150, -25),
        |  ('w_square', -150, -25, -150, -75),
        |  ('ne_square', 100, 10, 160, 10),
        |  ('ne_square', 160, 10, 160, 70),
        |  ('ne_square', 160, 70, 100, 70),
        |  ('ne_square', 100, 70, 100, 10)),
        |pts AS (
        |  SELECT c_custkey, c_custkey % 350 - 175 AS px,
        |    c_custkey % 170 - 85 AS py
        |  FROM customer),
        |membership AS (
        |  SELECT fence, c_custkey,
        |    MIN((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) AS mincross
        |  FROM pts, edges GROUP BY fence, c_custkey)
        |SELECT fence, CAST(COUNT(*) AS BIGINT) AS n_points,
        |  CAST(SUM(CASE WHEN mincross >= 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_inside,
        |  CAST(SUM(CASE WHEN mincross = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_boundary,
        |  round(CAST(SUM(CASE WHEN mincross >= 0 THEN 1 ELSE 0 END)
        |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS share
        |FROM membership GROUP BY fence ORDER BY fence""".stripMargin,

    "q_selector_fallback" ->
      """WITH h AS (
        |  SELECT c_custkey,
        |    '<body>' ||
        |    CASE WHEN c_custkey % 3 = 0
        |         THEN '<h1 class="title">T' || c_custkey || '</h1>' ||
        |              CASE WHEN c_custkey % 6 = 0
        |                   THEN '<h1 class="title">U' || c_custkey || '</h1>'
        |                   ELSE '' END
        |         ELSE '' END ||
        |    CASE WHEN c_custkey % 3 = 1
        |         THEN '<div class="headline">H' || c_custkey || '</div>' ||
        |              '<p class="fallback">F' || c_custkey || '</p>'
        |         ELSE '' END ||
        |    CASE WHEN c_custkey % 3 = 2
        |         THEN '<p class="fallback">P' || c_custkey || '</p>'
        |         ELSE '' END ||
        |    '</body>' AS html
        |  FROM customer),
        |m AS (
        |  SELECT c_custkey,
        |    regexp_extract_all(html, '<h1 class="title">([^<]*)</h1>', 1) AS m1,
        |    regexp_extract_all(html, '<div class="headline">([^<]*)</div>', 1) AS m2,
        |    regexp_extract_all(html, '<p class="fallback">([^<]*)</p>', 1) AS m3
        |  FROM h),
        |w AS (
        |  SELECT c_custkey,
        |    CASE WHEN len(m1) > 0 THEN CAST(1 AS BIGINT)
        |         WHEN len(m2) > 0 THEN CAST(2 AS BIGINT)
        |         WHEN len(m3) > 0 THEN CAST(3 AS BIGINT)
        |         ELSE CAST(0 AS BIGINT) END AS matched_selector,
        |    CASE WHEN len(m1) > 0 THEN m1
        |         WHEN len(m2) > 0 THEN m2
        |         WHEN len(m3) > 0 THEN m3
        |         ELSE CAST([] AS VARCHAR[]) END AS mm
        |  FROM m)
        |SELECT c_custkey, matched_selector,
        |  CAST(len(mm) AS BIGINT) AS n_matches, mm[1] AS first_match
        |FROM w ORDER BY c_custkey""".stripMargin,

    "q_scalar_funcs" ->
      """SELECT o_orderkey,
        |  'ORD-' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS order_code,
        |  CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio_rank,
        |  replace(o_orderpriority, '-', '_') AS prio_snake,
        |  upper(o_orderstatus) AS status_u,
        |  CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(month(o_orderdate) AS BIGINT) AS m,
        |  CAST(day(o_orderdate) AS BIGINT) AS dom,
        |  CAST(datediff('day', DATE '2020-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
        |  o_orderkey % 7 AS mod7,
        |  pow(2, o_orderkey % 10) AS pow2,
        |  greatest(o_totalprice, 50000.0) AS floor_price
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_url_extract" ->
      """SELECT o_orderkey,
        |  'https://posts.example.com/p/' || o_orderkey || '?src=' || lower(o_orderstatus) AS url,
        |  'posts.example.com' AS host,
        |  '/p/' || o_orderkey AS path,
        |  lower(o_orderstatus) AS src_param
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_url_canonical" ->
      """WITH u AS (
        |  SELECT o_orderkey,
        |    'HTTPS://Posts.Example.COM:443/p/' || o_orderkey ||
        |    CASE WHEN o_orderkey % 2 = 0 THEN '/' ELSE '' END ||
        |    '?utm_source=ig&id=' || o_custkey || '&utm_campaign=x' ||
        |    CASE WHEN o_orderkey % 3 = 0 THEN '#frag' ELSE '' END AS url
        |  FROM orders),
        |n AS (SELECT o_orderkey, url,
        |        regexp_replace(url, '#.*$', '') AS nofrag FROM u),
        |parts AS (
        |  SELECT o_orderkey, url,
        |    lower(regexp_extract(nofrag, '^([a-zA-Z]+)://', 1)) AS proto,
        |    regexp_replace(lower(regexp_extract(nofrag,
        |      '^[a-zA-Z]+://([^/?#]+)', 1)), ':443$', '') AS host,
        |    regexp_replace(regexp_extract(nofrag,
        |      '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1), '/$', '') AS path,
        |    regexp_extract(nofrag, '\?(.*)$', 1) AS q
        |  FROM n),
        |k AS (
        |  SELECT *, array_to_string(list_filter(string_split(q, '&'),
        |    p -> NOT starts_with(p, 'utm_')), '&') AS kept
        |  FROM parts)
        |SELECT o_orderkey, url,
        |  proto || '://' || host || path ||
        |  CASE WHEN length(kept) > 0 THEN '?' || kept ELSE '' END AS canonical
        |FROM k ORDER BY o_orderkey""".stripMargin,

    "q_geo_haversine" ->
      """SELECT c_custkey,
        |  CAST(c_custkey % 170 AS DOUBLE) - 85.0 AS lat,
        |  CAST(c_custkey % 350 AS DOUBLE) - 175.0 AS lng,
        |  round(2 * 6371.0 * atan2(sqrt(a), sqrt(1.0 - a)), 6) AS dist_km
        |FROM (
        |  SELECT c_custkey,
        |    pow(sin((radians(CAST(c_custkey % 170 AS DOUBLE) - 85.0) - radians(19.4326)) / 2), 2) +
        |    cos(radians(19.4326)) * cos(radians(CAST(c_custkey % 170 AS DOUBLE) - 85.0)) *
        |    pow(sin((radians(CAST(c_custkey % 350 AS DOUBLE) - 175.0) - radians(-99.1332)) / 2), 2) AS a
        |  FROM customer) t
        |ORDER BY c_custkey""".stripMargin,

    // same cell formula, same candidate set, same tie-break — the
    // oracle restates the ALGORITHM (cell-bounded kNN), so both
    // engines agree at any density
    "q_geo_knn" ->
      """WITH loc AS (
        |  SELECT s_suppkey,
        |    CAST(s_suppkey * 7 % 170 AS DOUBLE) - 85.0 AS llat,
        |    CAST(s_suppkey * 13 % 350 AS DOUBLE) - 175.0 AS llng
        |  FROM supplier),
        |lc AS (SELECT *, CAST(floor(llat / 10.0) AS BIGINT) AS cla,
        |              CAST(floor(llng / 10.0) AS BIGINT) AS clo FROM loc),
        |pt AS (
        |  SELECT c_custkey,
        |    CAST(c_custkey % 170 AS DOUBLE) - 85.0 AS plat,
        |    CAST(c_custkey % 350 AS DOUBLE) - 175.0 AS plng
        |  FROM customer),
        |probes AS (
        |  SELECT c_custkey, plat, plng,
        |    CAST(floor(plat / 10.0) AS BIGINT) + dx.d AS cla,
        |    CAST(floor(plng / 10.0) AS BIGINT) + dy.d AS clo
        |  FROM pt, (VALUES (-1), (0), (1)) dx(d), (VALUES (-1), (0), (1)) dy(d)),
        |cand AS (
        |  SELECT p.c_custkey, p.plat, p.plng, l.s_suppkey, l.llat, l.llng
        |  FROM probes p JOIN lc l ON l.cla = p.cla AND l.clo = p.clo),
        |d AS (
        |  SELECT c_custkey, s_suppkey,
        |    round(2 * 6371.0 * atan2(sqrt(a), sqrt(1.0 - a)), 6) AS dist_km
        |  FROM (
        |    SELECT c_custkey, s_suppkey,
        |      pow(sin((radians(llat) - radians(plat)) / 2), 2) +
        |      cos(radians(plat)) * cos(radians(llat)) *
        |      pow(sin((radians(llng) - radians(plng)) / 2), 2) AS a
        |    FROM cand) t),
        |r AS (
        |  SELECT c_custkey, s_suppkey, dist_km,
        |    row_number() OVER (PARTITION BY c_custkey
        |                       ORDER BY dist_km, s_suppkey) AS rnk
        |  FROM d)
        |SELECT c_custkey, CAST(rnk AS BIGINT) AS rnk, s_suppkey, dist_km
        |FROM r WHERE rnk <= 3 ORDER BY c_custkey, rnk""".stripMargin,

    "q_html_extract" ->
      """WITH h AS (
        |  SELECT c_custkey,
        |    '<div class="news--box"><a title="' || c_name || '" href="/n/' || c_custkey ||
        |    '"><img src="' ||
        |    CASE WHEN c_custkey % 2 = 0 THEN 'https://cdn.example.com/i.jpg'
        |         ELSE '/static/i.jpg' END || '"></a></div>' AS html
        |  FROM customer)
        |SELECT c_custkey,
        |  regexp_extract(html, 'title="([^"]*)"', 1) AS title,
        |  regexp_extract(html, 'href="([^"]*)"', 1) AS href,
        |  CASE WHEN starts_with(regexp_extract(html, 'src="([^"]*)"', 1), 'http')
        |       THEN regexp_extract(html, 'src="([^"]*)"', 1)
        |       ELSE 'https://news.example.com' || regexp_extract(html, 'src="([^"]*)"', 1)
        |  END AS image_abs
        |FROM h ORDER BY c_custkey""".stripMargin,

    // expected values derived analytically from (c_custkey, row_no):
    // the oracle checks the two-level DOM parse without parsing
    "q_dom_table" ->
      """WITH rows_ AS (
        |  SELECT c_custkey, unnest(range(0, 3)) AS j FROM customer),
        |r AS (
        |  SELECT c_custkey, j FROM rows_
        |  WHERE j < 2 + c_custkey % 2)
        |SELECT c_custkey, CAST(j AS BIGINT) AS row_no,
        |  'Bank ' || c_custkey || '-' || j AS entity,
        |  'bank' || c_custkey || '-' || j || '.example.com/mx' AS url,
        |  '1' || j || '.' || (c_custkey % 10) || '0' AS buy,
        |  CASE WHEN (c_custkey + j) % 3 <> 0
        |       THEN '2' || j || '.' || (c_custkey % 10) || '5'
        |       ELSE '1' || j || '.' || (c_custkey % 10) || '0' END AS sell
        |FROM r ORDER BY c_custkey, row_no""".stripMargin,

    // same derived page text, same first-sentinel-wins CASE order
    "q_alert_rows" ->
      """WITH p AS (
        |  SELECT c_custkey,
        |    '<html><body>' ||
        |    CASE WHEN c_custkey % 7 = 0 THEN 'Login • Instagram'
        |         WHEN c_custkey % 7 = 1 THEN 'Suspicious Login Attempt'
        |         WHEN c_custkey % 7 = 2
        |           THEN 'Your Account Has Been Temporarily Locked'
        |         WHEN c_custkey % 7 = 3
        |           THEN 'Suspicious Login Attempt ... Login • Instagram'
        |         ELSE 'feed' END || '</body></html>' AS page
        |  FROM customer)
        |SELECT c_custkey,
        |  CASE WHEN contains(page, 'Login • Instagram')
        |         THEN 'LOGIN_REQUIRED'
        |       WHEN contains(page, 'Suspicious Login Attempt')
        |         THEN 'SUSPICIOUS_ATTEMPT'
        |       WHEN contains(page, 'Your Account Has Been Temporarily Locked')
        |         THEN 'ACCOUNT_LOCKED'
        |  END AS alert
        |FROM p WHERE CASE WHEN contains(page, 'Login • Instagram')
        |         THEN 'LOGIN_REQUIRED'
        |       WHEN contains(page, 'Suspicious Login Attempt')
        |         THEN 'SUSPICIOUS_ATTEMPT'
        |       WHEN contains(page, 'Your Account Has Been Temporarily Locked')
        |         THEN 'ACCOUNT_LOCKED'
        |  END IS NOT NULL
        |ORDER BY c_custkey""".stripMargin,

    // the oracle derives expected values ANALYTICALLY from the row key
    // (the HTML is a pure function of it) — so the Spark side's real
    // parse of the messy markup is checked against ground truth, not
    // against another parser
    "q_dom_extract" ->
      """SELECT c_custkey,
        |  c_name AS title,
        |  '/n/' || c_custkey AS url,
        |  CAST(CASE WHEN c_custkey % 3 = 0 THEN 2 ELSE 1 END AS BIGINT)
        |    AS n_box,
        |  'Go ' || c_custkey AS label
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_deadletter_json" ->
      """WITH j AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 2 = 1 THEN substring(props, 1, length(props) - 2)
        |         ELSE props END AS js
        |  FROM events),
        |v AS (
        |  -- null out invalid payloads BEFORE extraction: a json_valid
        |  -- guard inside the same CASE does not stop DuckDB from
        |  -- evaluating json_extract on the malformed rows
        |  SELECT event_id, CASE WHEN json_valid(js) THEN js END AS vjs FROM j)
        |SELECT event_id,
        |  CASE WHEN json_extract_string(vjs, '$.k') IS NOT NULL
        |       THEN 'ok' ELSE 'dead' END AS channel,
        |  CAST(json_extract_string(vjs, '$.k') AS BIGINT) AS k
        |FROM v ORDER BY event_id""".stripMargin,

    "q_json_dialect" ->
      """WITH j AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 2 = 0
        |      THEN '{"graphql":{"post":{"id":"p' || o_orderkey || '","like_count":' || o_custkey || '}}}'
        |      ELSE '{"data":{"media":{"pk":"p' || o_orderkey || '","likes":' || o_custkey || '}}}'
        |    END AS js
        |  FROM orders)
        |SELECT o_orderkey,
        |  COALESCE(json_extract_string(js, '$.graphql.post.id'),
        |           json_extract_string(js, '$.data.media.pk')) AS post_id,
        |  COALESCE(CAST(json_extract_string(js, '$.graphql.post.like_count') AS BIGINT),
        |           CAST(json_extract_string(js, '$.data.media.likes') AS BIGINT)) AS likes,
        |  CASE WHEN json_extract(js, '$.graphql') IS NOT NULL THEN 'graphql' ELSE 'data' END AS dialect
        |FROM j ORDER BY o_orderkey""".stripMargin
  )
}
