package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Ingest

/** Golden-fixture ingestion tests (FIXTURES.md §1-§4): the reference's
  * real input shapes through the from_json projections, asserting the
  * exact output rows including the documented edge cases. */
class IngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixture(name: String) = {
    import spark.implicits._
    val path = getClass.getResource(s"/fixtures/$name").getPath
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8").trim
    Seq(text).toDF("json")
  }

  test("P1: GraphQL TagPage projection with empty-caption edge case") {
    val rows = Ingest.postsFromGraphql(fixture("tagpage_graphql.json"), "tacos")
      .orderBy("id").collect()
    assert(rows.length == 2)
    val r0 = rows(0)
    assert(r0.getAs[String]("id") == "26934")
    assert(r0.getAs[String]("permalink") == "https://www.instagram.com/p/CRx1/")
    assert(r0.getAs[Long]("likeCount") == 42L)
    assert(r0.getAs[String]("caption") == "Tacos!")
    assert(r0.getAs[String]("mediaType") == "GraphImage") // __typename
    assert(r0.getAs[String]("source") == "tacos")
    // empty edge_media_to_caption.edges → caption null (undefined in ref)
    assert(rows(1).getAs[String]("caption") == null)
  }

  test("P2/P3: data-dialect projection, caption default, carousel fallback") {
    val rows = Ingest.postsFromData(fixture("tagpage_data.json"), "tacos")
      .orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("mediaUrl") == "https://cdn.example/p2.jpg")
    assert(rows(0).getAs[String]("caption") == "Birria")
    // caption null → '' and primary image missing → carousel fallback
    assert(rows(1).getAs[String]("caption") == "")
    assert(rows(1).getAs[String]("mediaUrl") == "https://cdn.example/p3.jpg")
  }

  test("S2: dialect dispatch unions both parse paths") {
    val pages = fixture("tagpage_graphql.json").unionByName(fixture("tagpage_data.json"))
    val rows = Ingest.postsFromTagPage(pages, "tacos").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[String]("id")).sorted.toSeq ==
      Seq("26934", "26935", "26936", "26938"))
  }

  test("P6: GeoJSON point is [lng, lat]; missing lat → no gps") {
    val withGps = Ingest.locationFromDetail(
      fixture("location_graphql.json"), lit("L1"), lit("Telefonica"))
      .collect()(0)
    val gps = withGps.getStruct(withGps.fieldIndex("gps"))
    assert(gps.getString(0) == "Point")
    assert(gps.getSeq[Double](1) == Seq(-117.03, 32.52)) // [lng, lat]!
    assert(withGps.getAs[String]("aliasOnFB") == "tgp")

    val noLat = Ingest.locationFromDetail(
      fixture("location_native_nolat.json"), lit("L2"), lit("X")).collect()(0)
    assert(noLat.isNullAt(noLat.fieldIndex("gps")))

    // JS truthiness: lat=0/lng=0 is falsy in the reference → no gps
    val zero = Ingest.locationFromDetail(
      fixture("location_zero.json"), lit("L3"), lit("Null Island")).collect()(0)
    assert(zero.isNullAt(zero.fieldIndex("gps")))
  }

  test("P4/P5: profile → follower with category fallback and media source") {
    val r = Ingest.followerFromProfile(
      fixture("profile_page.json"), lit("u9"), lit("chefx")).collect()(0)
    assert(r.getAs[String]("category_name") == "Restaurant") // fallback
    assert(r.getAs[Long]("followers") == 5000L)
    assert(r.getAs[Boolean]("is_business_account"))
    val media = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("media"))
    assert(media.length == 1)
    assert(media.head.getAs[String]("source") == "followers")
    assert(media.head.getAs[String]("mediaType") == "GraphSidecar")
    assert(media.head.isNullAt(media.head.fieldIndex("accessibility")))
    assert(media.head.getAs[String]("caption") == "") // empty caption edges
    assert(media.head.getAs[String]("permalink") == "https://www.instagram.com/p/CZz9/")
  }

  test("J5: Rekognition labels reshape to {confidence, name}") {
    import spark.implicits._
    val in = fixture("rekognition.json").withColumn("id", lit("p1"))
    val labels = Ingest.labelsFromRekognition(in).collect()(0)
      .getSeq[org.apache.spark.sql.Row](1)
    assert(labels.map(l => (l.getDouble(0), l.getString(1))) ==
      Seq((97.2, "Food"), (81.0, "Taco")))
  }

  test("T1: topic document assembly drops null parts, location gets a dot") {
    import spark.implicits._
    val df = Seq(
      ("Tacos!", "Photo of tacos", "Cafe Estrella", "Chicago, Illinois"),
      ("Tacos!", null, null, null),
      (null, "Photo of tacos", null, null)
    ).toDF("caption", "acc", "fullName", "locName")
    val out = df.select(Ingest.topicDocument(
      col("caption"), col("acc"), col("fullName"), col("locName")).as("doc"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq(
      "Tacos!.Photo of tacos.Cafe Estrella.Chicago, Illinois.",
      "Tacos!",
      // reference seeds content with caption||'' (topics.js:15): a null
      // caption still yields a leading empty segment
      ".Photo of tacos"))
  }
}
