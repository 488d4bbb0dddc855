package graft

import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger
import graft.fetch.{SyntheticConfig, SyntheticInternet}
import graft.parse.HtmlMeta
import graft.links.LinkExtractor

/** Spark-free parallel-scaling probe of the raw fetch+parse work:
  * generate + parse + extract links for N pages on T threads. Separates
  * "my code doesn't scale" from "Spark orchestration doesn't scale" from
  * "this VM's memory bandwidth saturates". */
object CpuProbe {
  def main(args: Array[String]): Unit = {
    val pages = args.headOption.map(_.toInt).getOrElse(4000)
    val paragraphs = args.lift(1).map(_.toInt).getOrElse(60)
    val internet = SyntheticInternet(SyntheticConfig(
      seed = 42L, nSites = 100, pagesPerSite = 60, imagesPerSite = 0,
      itemsPerFeed = 3, bodyParagraphs = paragraphs))

    def work(i: Int): Int = {
      val url = s"https://site-${i % 100}.test/page/${i % 60}"
      val resp = internet.get(url)
      val text = resp.text.getOrElse("")
      val meta = new HtmlMeta(url, text)
      val links = LinkExtractor.links(url, text)
      meta.title.map(_.length).getOrElse(0) + links.size
    }

    // warmup
    (0 until 2000).foreach(work)

    Seq(1, 8, 32).foreach { threads =>
      val pool = Executors.newFixedThreadPool(threads)
      val counter = new AtomicInteger()
      val t0 = System.nanoTime()
      val sink = new AtomicInteger()
      (0 until pages).foreach { i =>
        pool.submit(new Runnable {
          def run(): Unit = { sink.addAndGet(work(i)); counter.incrementAndGet() }
        })
      }
      pool.shutdown()
      pool.awaitTermination(600, TimeUnit.SECONDS)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"CPUPROBE threads=$threads pages=$pages sec=$sec%.2f pps=${pages / sec}%.1f sink=${sink.get}")
    }
  }
}
