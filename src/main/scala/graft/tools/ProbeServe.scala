package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.spark.sql.SparkSession

import graft.server.HttpFrontend
import graft.sql.GraftContext

/** Serving-tier concurrency probe: N parallel HTTP readers against a
  * concurrent writer, measuring read throughput and tail latency while
  * versions churn — the measured claim behind the lock-free snapshot-
  * session serving design (reads bind to a per-(db, generation) snapshot;
  * writers advance the generation without blocking them).
  *
  *   scripts/run.sh graft.tools.ProbeServe [readers=16] [seconds=20]
  *
  * Prints one JSON line: reads, reads/sec, p50/p99 read ms, writes,
  * writes/sec.
  */
object ProbeServe {
  def main(args: Array[String]): Unit = {
    val readers = args.headOption.map(_.toInt).getOrElse(16)
    val seconds = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = java.nio.file.Files.createTempDirectory("graft-serve-probe").toString
    val ctx = new GraftContext(spark, dir)
    ctx.execute("CREATE TABLE kv (k BIGINT, v DOUBLE)")
    ctx.execute("INSERT INTO kv SELECT id, id * 1.5 FROM range(10000)")
    val fe = new HttpFrontend(ctx, 0, writeToken = Some("tok"))
    fe.start()
    val base = s"http://127.0.0.1:${fe.boundPort}"
    val client = HttpClient.newHttpClient()

    val stop = new AtomicBoolean(false)
    val reads = new AtomicLong(0)
    val writes = new AtomicLong(0)
    val failures = new AtomicLong(0)
    val latencies = new java.util.concurrent.ConcurrentLinkedQueue[Long]()

    val firstFailure = new java.util.concurrent.atomic.AtomicReference[String](null)
    def post(path: String, body: String, token: Option[String] = None): Int = {
      val b = HttpRequest.newBuilder(URI.create(base + path))
        .POST(HttpRequest.BodyPublishers.ofString(body))
      token.foreach(t => b.header("Authorization", s"Bearer $t"))
      val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200)
        firstFailure.compareAndSet(null, s"${resp.statusCode()}: ${resp.body().take(300)}")
      resp.statusCode()
    }

    // reads ride GET /q/<query> — the reference's read surface (POST /q
    // requires the write token); distinct ranges keep every request a real
    // execution (no client cache, no If-None-Match)
    val readerThreads = (0 until readers).map { i =>
      new Thread(() => {
        val rnd = new scala.util.Random(i)
        while (!stop.get()) {
          val lo = rnd.nextInt(9000)
          val q = java.net.URLEncoder.encode(
            s"SELECT count(*) AS n, sum(v) AS s FROM kv WHERE k BETWEEN $lo AND ${lo + 999}",
            "UTF-8")
          val t0 = System.nanoTime()
          val resp = client.send(
            HttpRequest.newBuilder(URI.create(s"$base/q/$q")).GET().build(),
            HttpResponse.BodyHandlers.ofString())
          val dt = System.nanoTime() - t0
          if (resp.statusCode() == 200) { reads.incrementAndGet(); latencies.add(dt) }
          else {
            firstFailure.compareAndSet(null, s"${resp.statusCode()}: ${resp.body().take(300)}")
            failures.incrementAndGet()
          }
        }
      })
    }
    val writerThread = new Thread(() => {
      var i = 0
      while (!stop.get()) {
        val code = post("/q",
          s"""{"query": "INSERT INTO kv VALUES (${100000 + i}, $i.5)"}""", Some("tok"))
        if (code == 200) writes.incrementAndGet() else failures.incrementAndGet()
        i += 1
      }
    })

    val t0 = System.nanoTime()
    readerThreads.foreach(_.start()); writerThread.start()
    Thread.sleep(seconds * 1000L)
    stop.set(true)
    readerThreads.foreach(_.join(10000)); writerThread.join(10000)
    val wallS = (System.nanoTime() - t0) / 1e9
    fe.stop()

    val lat = latencies.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
    def pct(p: Double): Double =
      if (lat.isEmpty) -1 else lat(math.min(lat.length - 1, (p * lat.length).toInt)) / 1e6
    println(
      s"""{"readers":$readers,"seconds":$wallS,"reads":${reads.get()},""" +
      s""""reads_per_sec":${reads.get() / wallS},"read_p50_ms":${pct(0.5)},""" +
      s""""read_p99_ms":${pct(0.99)},"writes":${writes.get()},""" +
      s""""writes_per_sec":${writes.get() / wallS},"failures":${failures.get()}}""")
    Option(firstFailure.get()).foreach(f => println(s"first failure: $f"))
    spark.stop()
  }
}
