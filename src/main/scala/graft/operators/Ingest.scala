package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's semi-structured ingestion surface as library
  * functions (SURVEY.md §1.4 input schemas → §1.2 storage shapes):
  * dialect-dispatched TagPage parsing (P1/P2/P3), location detail with
  * GeoJSON point assembly (P6), profile→follower projection with
  * timeline media (P4/P5), Rekognition label reshaping (J5), and the
  * topic-document assembly (T1). All pure `from_json` + builtin
  * expressions — permissive parsing reproduces the reference's
  * defensive null-guarding (F4), and every function is a narrow
  * projection (no shuffle) that scales embarrassingly.
  *
  * Exercised against golden fixtures in src/test/resources/fixtures
  * (IngestSpec) — the shapes documented in FIXTURES.md.
  */
object Ingest {

  // ---- schemas (§1.4) --------------------------------------------------
  private def s(fields: StructField*) = StructType(fields)
  private def f(n: String, t: DataType) = StructField(n, t)

  private val countStruct = s(f("count", LongType))
  private val captionEdges =
    s(f("edges", ArrayType(s(f("node", s(f("text", StringType)))))))

  val tagPageGraphqlSchema: StructType = {
    val node = s(
      f("id", StringType), f("shortcode", StringType),
      f("thumbnail_src", StringType), f("accessibility_caption", StringType),
      f("__typename", StringType),
      f("edge_media_preview_like", countStruct),
      f("edge_media_to_comment", countStruct),
      f("edge_media_to_caption", captionEdges))
    s(f("graphql", s(f("hashtag", s(f("edge_hashtag_to_media",
      s(f("edges", ArrayType(s(f("node", node)))))))))))
  }

  val tagPageDataSchema: StructType = {
    val candidates = s(f("candidates", ArrayType(s(f("url", StringType)))))
    val media = s(
      f("id", StringType), f("code", StringType),
      f("like_count", LongType), f("comment_count", LongType),
      f("caption", s(f("text", StringType))),
      f("image_versions2", candidates),
      f("carousel_media", ArrayType(s(f("image_versions2", candidates)))))
    val sections = ArrayType(s(f("layout_content",
      s(f("medias", ArrayType(s(f("media", media))))))))
    s(f("data", s(f("recent", s(f("sections", sections))))))
  }

  val locationDetailSchema: StructType = {
    val loc = s(f("phone", StringType), f("primary_alias_on_fb", StringType),
      f("website", StringType), f("blurb", StringType),
      f("lat", DoubleType), f("lng", DoubleType))
    s(f("graphql", s(f("location", loc))),
      f("native_location_data", s(f("location_info", loc))))
  }

  val profilePageSchema: StructType = {
    val mediaNode = s(
      f("id", StringType), f("shortcode", StringType),
      f("display_url", StringType), f("__typename", StringType),
      f("accessibility_caption", StringType),
      f("edge_liked_by", countStruct),
      f("edge_media_to_comment", countStruct),
      f("edge_media_to_caption", captionEdges))
    val user = s(
      f("biography", StringType), f("category_name", StringType),
      f("business_category_name", StringType),
      f("edge_follow", countStruct),
      f("edge_followed_by", countStruct),
      f("is_business_account", BooleanType),
      f("is_professional_account", BooleanType),
      f("is_verified", BooleanType),
      f("edge_owner_to_timeline_media", s(f("count", LongType),
        f("edges", ArrayType(s(f("node", mediaNode)))))))
    s(f("graphql", s(f("user", user))))
  }

  val rekognitionSchema: StructType = s(f("Labels", ArrayType(s(
    f("Confidence", DoubleType), f("Name", StringType)))))

  // ---- projections ------------------------------------------------------

  /** Both TagPage dialects in ONE schema (their top-level keys are
    * disjoint), so the dialect dispatch pays a single `from_json` per
    * page and branches on struct nullity — instead of re-scanning the
    * raw JSON string per dialect probe (see [[postsFromTagPage]]). */
  val tagPageCombinedSchema: StructType =
    StructType(tagPageGraphqlSchema.fields ++ tagPageDataSchema.fields)

  /** P1: GraphQL-dialect TagPage → flat Post rows
    * (reference posts-from-hashtags.js:59-79). */
  def postsFromGraphql(pages: DataFrame, source: String): DataFrame =
    projectGraphql(
      pages.select(from_json(col("json"), tagPageGraphqlSchema).as("p")),
      source)

  /** The GraphQL projection over an already-parsed `p` struct. */
  private def projectGraphql(parsed: DataFrame, source: String): DataFrame =
    parsed
      .select(explode(col("p.graphql.hashtag.edge_hashtag_to_media.edges")).as("e"))
      .select(
        col("e.node.id").as("id"),
        col("e.node.shortcode").as("shortcode"),
        concat(lit("https://www.instagram.com/p/"), col("e.node.shortcode"),
          lit("/")).as("permalink"),
        col("e.node.edge_media_preview_like.count").as("likeCount"),
        col("e.node.edge_media_to_comment.count").as("commentsCount"),
        try_element_at(col("e.node.edge_media_to_caption.edges"), lit(1))
          .getField("node").getField("text").as("caption"),
        col("e.node.thumbnail_src").as("mediaUrl"),
        col("e.node.__typename").as("mediaType"),
        col("e.node.accessibility_caption").as("accessibility"),
        lit(source).as("source"))

  /** P2+P3: "data"-dialect TagPage → flat Post rows, caption defaulted to
    * '' and image coalesced through the carousel fallback
    * (posts-from-hashtags.js:18-57). */
  def postsFromData(pages: DataFrame, source: String): DataFrame =
    projectData(
      pages.select(from_json(col("json"), tagPageDataSchema).as("p")), source)

  /** The "data"-dialect projection over an already-parsed `p` struct. */
  private def projectData(parsed: DataFrame, source: String): DataFrame =
    parsed
      .select(explode(col("p.data.recent.sections")).as("s"))
      .select(explode(col("s.layout_content.medias")).as("m"))
      .select(
        col("m.media.id").as("id"),
        col("m.media.code").as("shortcode"),
        concat(lit("https://www.instagram.com/p/"), col("m.media.code"),
          lit("/")).as("permalink"),
        col("m.media.like_count").as("likeCount"),
        col("m.media.comment_count").as("commentsCount"),
        coalesce(col("m.media.caption.text"), lit("")).as("caption"),
        coalesce(
          try_element_at(col("m.media.image_versions2.candidates"), lit(1)).getField("url"),
          try_element_at(try_element_at(col("m.media.carousel_media"), lit(1))
            .getField("image_versions2").getField("candidates"), lit(1))
            .getField("url")).as("mediaUrl"),
        // the data dialect carries no __typename; null keeps the union
        // schema aligned with the GraphQL dialect
        lit(null).cast(StringType).as("mediaType"),
        lit(null).cast(StringType).as("accessibility"),
        lit(source).as("source"))

  /** S2 dialect dispatch: parse with the combined schema, branch on
    * which top-level struct is present, union
    * (posts-from-hashtags.js:121-122). NOTE the union's two branches
    * each evaluate from_json independently (Catalyst does not share
    * subexpressions across union branches), so an UNCACHED input is
    * parsed once per dialect branch — still a win over the old
    * get_json_object probes (which added a third partial parse).
    * Callers CAN persist [[parseTagPage]]'s output for a true single
    * parse, but measure first: q_etl_pipeline did in r4 and removed the
    * cache in r5 when the columnar write of the parsed structs (~1.4 s
    * at sf0.1) overtook the ~0.2 s parse it saved (Pipeline.scala). */
  def postsFromTagPage(pages: DataFrame, source: String): DataFrame =
    postsFromParsed(parseTagPage(pages), source)

  /** The parse step alone (`json` string → combined-schema struct `p`).
    * Split out so a caller composing several consumers of the same page
    * batch can persist the PARSED struct if the parse dominates —
    * see [[postsFromTagPage]]'s note on when that trade actually pays. */
  def parseTagPage(pages: DataFrame): DataFrame =
    pages.select(from_json(col("json"), tagPageCombinedSchema).as("p"))

  /** Dialect dispatch over an already-parsed page batch. */
  def postsFromParsed(parsed: DataFrame, source: String): DataFrame =
    projectGraphql(parsed.filter(col("p.graphql").isNotNull), source)
      .unionByName(projectData(parsed.filter(col("p.data").isNotNull), source))

  /** P6: location detail (either dialect) → Location row with GeoJSON
    * point ([lng, lat]!) only when both coordinates present
    * (posts-from-hashtags.js:131-141, 170-190). */
  def locationFromDetail(pages: DataFrame, id: Column, name: Column): DataFrame =
    pages
      .select(id.as("id"), name.as("name"),
        from_json(col("json"), locationDetailSchema).as("p"))
      .withColumn("loc", coalesce(col("p.graphql.location"),
        col("p.native_location_data.location_info")))
      .select(
        col("id"), col("name"),
        col("loc.phone").as("phone"),
        col("loc.primary_alias_on_fb").as("aliasOnFB"),
        col("loc.website").as("website"),
        col("loc.blurb").as("blurb"),
        // JS truthiness (posts-from-hashtags.js:184): lat/lng of exactly 0
        // yields no gps in the reference, so gate on non-null AND non-zero
        when(col("loc.lat").isNotNull && col("loc.lng").isNotNull &&
          col("loc.lat") =!= 0d && col("loc.lng") =!= 0d,
          struct(lit("Point").as("type"),
            array(col("loc.lng"), col("loc.lat")).as("coordinates")))
          .as("gps"))

  /** P4+P5: ProfilePage → Follower row with nested timeline media
    * (extend-followers.js:24-66); category falls back to the business
    * category, media captions default to '', source is the literal
    * 'followers'. */
  def followerFromProfile(pages: DataFrame, id: Column, username: Column): DataFrame =
    pages
      .select(id.as("id"), username.as("username"),
        from_json(col("json"), profilePageSchema).getField("graphql")
          .getField("user").as("u"))
      .select(
        col("id"), col("username"),
        col("u.biography").as("biography"),
        coalesce(col("u.category_name"), col("u.business_category_name"))
          .as("category_name"),
        col("u.edge_follow.count").as("following"),
        col("u.edge_followed_by.count").as("followers"),
        col("u.edge_owner_to_timeline_media.count").as("posts"),
        col("u.is_business_account").as("is_business_account"),
        col("u.is_professional_account").as("is_professional_account"),
        col("u.is_verified").as("is_verified"),
        transform(col("u.edge_owner_to_timeline_media.edges"), e => struct(
          e.getField("node").getField("id").as("id"),
          e.getField("node").getField("shortcode").as("shortcode"),
          concat(lit("https://www.instagram.com/p/"),
            e.getField("node").getField("shortcode"), lit("/")).as("permalink"),
          e.getField("node").getField("edge_liked_by").getField("count")
            .as("likeCount"),
          e.getField("node").getField("edge_media_to_comment").getField("count")
            .as("commentsCount"),
          coalesce(try_element_at(e.getField("node").getField("edge_media_to_caption")
            .getField("edges"), lit(1)).getField("node").getField("text"), lit(""))
            .as("caption"),
          e.getField("node").getField("display_url").as("mediaUrl"),
          e.getField("node").getField("__typename").as("mediaType"),
          e.getField("node").getField("accessibility_caption").as("accessibility"),
          lit("followers").as("source"))).as("media"))

  /** J5: Rekognition response → [{confidence, name}] (labels.js:51-71,
    * rename-projection posts-from-hashtags.js:327-333). */
  def labelsFromRekognition(responses: DataFrame): DataFrame =
    responses
      .select(col("id"),
        transform(from_json(col("json"), rekognitionSchema).getField("Labels"),
          l => struct(l.getField("Confidence").as("confidence"),
            l.getField("Name").as("name"))).as("labels"))

  /** T1: topic-document assembly — [caption, accessibility?, fullName?,
    * locationName + '.'?].join('.') with null parts dropped
    * (topics.js:15-27). */
  def topicDocument(caption: Column, accessibility: Column,
      fullName: Column, locationName: Column): Column =
    // the reference always seeds content with `caption || ''` (topics.js:15),
    // so a null caption still contributes a leading empty segment
    // ('.Photo of...'), while the optional parts are dropped when
    // absent — concat_ws itself skips null array elements, so no
    // explicit compact step is needed
    concat_ws(".", array(
      coalesce(caption, lit("")), accessibility, fullName,
      when(locationName.isNotNull, concat(locationName, lit(".")))))
}
