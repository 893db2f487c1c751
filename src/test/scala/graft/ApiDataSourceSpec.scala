package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.sources.ApiSource
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.types._
import scala.collection.mutable

/** DataSource V2 round-trip for the paginated API source: pages are
  * planned as input partitions and fetched through the real
  * JdkTransport against a live stub server — `spark.read.format`
  * in, exactly-once rows out, explicit pagination (no silent caps). */
class ApiDataSourceSpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("n", IntegerType)))

  /** Stub endpoint: /items?page=N serves 3+3+2 items, then []. */
  private def withServer(f: (String, mutable.Buffer[Int], mutable.Map[String, String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val hits = mutable.Buffer.empty[Int]
    val seenHeaders = mutable.Map.empty[String, String]
    server.createContext("/items", new HttpHandler {
      def handle(x: HttpExchange): Unit = {
        val page = x.getRequestURI.getQuery.split('&')
          .collectFirst { case q if q.startsWith("page=") => q.drop(5).toInt }.get
        hits.synchronized { hits += page }
        Option(x.getRequestHeaders.getFirst("x-graft-token"))
          .foreach(v => seenHeaders.synchronized { seenHeaders("x-graft-token") = v })
        val items = page match {
          case 0 => Seq("""{"id":"i0","name":"a","n":10}""",
            """{"id":"i1","name":"b","n":11}""", """{"id":"i2","name":"c","n":12}""")
          case 1 => Seq("""{"id":"i3","name":"d","n":13}""",
            """{"id":"i4","n":14}""", """{"id":"i5","name":"f","n":15}""")
          case 2 => Seq("""{"id":"i6","name":"g","n":16}""",
            """{"id":"i7","name":"h"}""")
          case _ => Seq.empty
        }
        val body = items.mkString("[", ",", "]").getBytes(StandardCharsets.UTF_8)
        x.getResponseHeaders.set("content-type", "application/json")
        x.sendResponseHeaders(200, body.length)
        x.getResponseBody.write(body); x.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}", hits, seenHeaders)
    finally server.stop(0)
  }

  private def expectedIds = (0 to 7).map(i => s"i$i").toSet

  test("stripe mode: parallel stripes walk to exhaustion, exactly-once rows") {
    withServer { (endpoint, hits, _) =>
      val df = spark.read.format("graft-api")
        .schema(schema)
        .option("endpoint", endpoint)
        .option("urlTemplate", "/items?page={page}")
        .option("pageSize", "3")
        .option("partitions", "2")
        .load()
      assert(df.rdd.getNumPartitions == 2)
      val rows = df.collect()
      assert(rows.length == 8)
      assert(rows.map(_.getString(0)).toSet == expectedIds)
      // missing JSON fields surface as nulls under the explicit schema
      val i4 = rows.find(_.getString(0) == "i4").get
      assert(i4.isNullAt(1) && i4.getInt(2) == 14)
      val i7 = rows.find(_.getString(0) == "i7").get
      assert(i7.getString(1) == "h" && i7.isNullAt(2))
      // stripe 0 walks 0,2 (short page stops it); stripe 1 walks 1,3
      // (empty page stops it) — full coverage, no silent cap, no overlap
      assert(hits.toSet == Set(0, 1, 2, 3))
    }
  }

  test("no pageSize declared: stripes stop only on EMPTY pages — a " +
      "server paging smaller than any guess is still read in full") {
    withServer { (endpoint, hits, _) =>
      val df = spark.read.format("graft-api")
        .schema(schema)
        .option("endpoint", endpoint)
        .option("urlTemplate", "/items?page={page}")
        .option("partitions", "2")
        .load()
      assert(df.collect().map(_.getString(0)).toSet == expectedIds)
      // stripe 0 walks 0,2,4 (empty stops it); stripe 1 walks 1,3
      assert(hits.toSet == Set(0, 1, 2, 3, 4))
    }
  }

  test("pageSize must be positive: 0 would spin forever on empty pages") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-api")
        .schema(schema)
        .option("endpoint", "http://127.0.0.1:1")
        .option("urlTemplate", "/x?page={page}")
        .option("pageSize", "0")
        .load()
    }
    assert(e.getMessage.contains("pageSize"))
  }

  test("known page count: exactly partition-per-page, no probe fetches") {
    withServer { (endpoint, hits, _) =>
      val df = spark.read.format("graft-api")
        .schema(schema)
        .option("endpoint", endpoint)
        .option("urlTemplate", "/items?page={page}")
        .option("pages", "3")
        .load()
      assert(df.rdd.getNumPartitions == 3)
      assert(df.collect().map(_.getString(0)).toSet == expectedIds)
      assert(hits.toSet == Set(0, 1, 2)) // page 3 never touched
    }
  }

  test("limit pushdown: .limit(n) stops FETCHING pages, not just emitting rows") {
    withServer { (endpoint, hits, _) =>
      val df = spark.read.format("graft-api")
        .schema(schema)
        .option("endpoint", endpoint)
        .option("urlTemplate", "/items?page={page}")
        .option("pageSize", "3")
        .option("partitions", "2")
        .load()
        .limit(2)
      val rows = df.collect()
      assert(rows.length == 2)
      // 2 rows fit in page 0: exactly ONE request goes on the wire (a
      // full stripe walk would fetch pages 0-3; even "stop emitting"
      // without fetch-stop would probe one page per stripe)
      assert(hits.toSeq == Seq(0), s"pages fetched: $hits")
    }
    withServer { (endpoint, hits, _) =>
      val n = spark.read.format("graft-api")
        .schema(schema)
        .option("endpoint", endpoint)
        .option("urlTemplate", "/items?page={page}")
        .option("pageSize", "3")
        .load()
        .limit(5).count()
      assert(n == 5)
      assert(hits.toSeq == Seq(0, 1), s"pages fetched: $hits") // ceil(5/3) = 2 pages
    }
  }

  test("limit pushdown respects a declared page count: the walk never probes " +
      "past page n-1 (servers whose out-of-range pages error, not [])") {
    // the stub answers pages 0-2; pages >= 3 don't exist on a server
    // like this contract's worst case, so the ONLY safe behavior with
    // pages=3 is to stop at page 2 even when the limit is unsatisfied
    withServer { (endpoint, hits, _) =>
      val rows = spark.read.format("graft-api")
        .schema(schema)
        .option("endpoint", endpoint)
        .option("urlTemplate", "/items?page={page}")
        .option("pages", "3")
        .load()
        .limit(100) // larger than the dataset
        .collect()
      assert(rows.length == 8)
      assert(hits.toSet == Set(0, 1, 2), s"probed past the declared range: $hits")
    }
  }

  test("limit walk with declared pages tolerates an empty MID-RANGE page: " +
      ".limit(n) sees the same rows the unlimited partition-per-page scan does") {
    // declared-pages semantics are positional, not sequential: page 1
    // being empty says nothing about page 2. The unlimited plan reads
    // pages independently and returns 5 rows; a limit walk that
    // terminated on the first [] would return only page 0's 3 rows.
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/sparse", new HttpHandler {
      def handle(x: HttpExchange): Unit = {
        val page = x.getRequestURI.getQuery.split('&')
          .collectFirst { case q if q.startsWith("page=") => q.drop(5).toInt }.get
        val items = page match {
          case 0 => Seq("""{"id":"s0","name":"a","n":0}""",
            """{"id":"s1","name":"b","n":1}""", """{"id":"s2","name":"c","n":2}""")
          case 2 => Seq("""{"id":"s3","name":"d","n":3}""", """{"id":"s4","name":"e","n":4}""")
          case _ => Seq.empty // page 1 empty mid-range; pages >= 3 out of range
        }
        val body = items.mkString("[", ",", "]").getBytes(StandardCharsets.UTF_8)
        x.sendResponseHeaders(200, body.length)
        x.getResponseBody.write(body); x.close()
      }
    })
    server.start()
    try {
      def scan = spark.read.format("graft-api")
        .schema(schema)
        .option("endpoint", s"http://127.0.0.1:${server.getAddress.getPort}")
        .option("urlTemplate", "/sparse?page={page}")
        .option("pages", "3")
        .load()
      val unlimited = scan.collect().map(_.getString(0)).toSet
      assert(unlimited == Set("s0", "s1", "s2", "s3", "s4"))
      val limited = scan.limit(5).collect().map(_.getString(0)).toSet
      assert(limited == unlimited,
        s"limit walk truncated at the empty mid-range page: $limited")
    } finally server.stop(0)
  }

  test("column pruning reaches the reader: the scan parses only required fields") {
    withServer { (endpoint, hits, _) =>
      val df = spark.read.format("graft-api")
        .schema(schema)
        .option("endpoint", endpoint)
        .option("urlTemplate", "/items?page={page}")
        .option("pages", "3")
        .load()
        .select("id")
      // the v2 scan line advertises the pruned column set
      val scanLine = df.queryExecution.executedPlan.toString.linesIterator
        .find(_.contains("graft-api")).getOrElse("")
      assert(scanLine.contains("cols=[id]"), scanLine)
      assert(df.collect().map(_.getString(0)).toSet == expectedIds)
      // row CARDINALITY survives an empty projection (count(*) path)
      assert(spark.read.format("graft-api")
        .schema(schema)
        .option("endpoint", endpoint)
        .option("urlTemplate", "/items?page={page}")
        .option("pages", "3")
        .load().count() == 8)
    }
  }

  test("header.* options reach the wire; DSv2 output feeds fieldOptions") {
    withServer { (endpoint, _, seenHeaders) =>
      val fields = spark.read.format("graft-api")
        .schema(ApiSource.fieldSchema)
        .option("endpoint", endpoint)
        .option("urlTemplate", "/items?page={page}")
        .option("pages", "1")
        .option("header.x-graft-token", "tok-123")
        .load()
      assert(fields.count() == 3)
      assert(seenHeaders.get("x-graft-token").contains("tok-123"))
      // same downstream shape as the driver-fetch source: the J11
      // option-id lookup consumes either without change
      assert(ApiSource.fieldOptions(fields).columns.toSeq ==
        Seq("field_id", "field_name", "option_name", "option_id"))
    }
  }

  test("schema is required: inference refuses with a pointed message") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-api")
        .option("endpoint", "http://127.0.0.1:1")
        .option("urlTemplate", "/x?page={page}")
        .load()
    }
    assert(e.getMessage.contains("schema"))
  }
}
