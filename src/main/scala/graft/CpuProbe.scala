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

  private def work(internet: SyntheticInternet, i: Int): Int = {
    val url = s"https://site-${i % 100}.test/page/${i % 60}"
    val resp = internet.get(url)
    val text = resp.text.getOrElse("")
    val meta = new HtmlMeta(url, text)
    val links = LinkExtractor.links(url, text)
    meta.title.map(_.length).getOrElse(0) + links.size
  }

  /** Pages/sec for `pages` synthetic fetch+parse units on `threads`
    * threads (callable from Bench for the report's pipeline-scaling row). */
  def measure(threads: Int, pages: Int, paragraphs: Int = 60): Double = {
    val internet = SyntheticInternet(SyntheticConfig(
      seed = 42L, nSites = 100, pagesPerSite = 60, imagesPerSite = 0,
      itemsPerFeed = 3, bodyParagraphs = paragraphs))
    (0 until 2000).foreach(work(internet, _)) // JIT warm
    val pool = Executors.newFixedThreadPool(threads)
    val sink = new AtomicInteger()
    val t0 = System.nanoTime()
    (0 until pages).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = { sink.addAndGet(work(internet, i)); () }
      })
    }
    pool.shutdown()
    pool.awaitTermination(600, TimeUnit.SECONDS)
    pages / ((System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val pages = args.headOption.map(_.toInt).getOrElse(4000)
    val paragraphs = args.lift(1).map(_.toInt).getOrElse(60)
    Seq(1, 8, 32).foreach { threads =>
      val pps = measure(threads, pages, paragraphs)
      println(f"CPUPROBE threads=$threads pages=$pages pps=$pps%.1f")
    }
  }
}
