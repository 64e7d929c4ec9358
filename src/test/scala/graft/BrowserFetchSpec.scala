package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.connectors.BrowserFetch

/** The headless-browser acquisition seam: the settling protocol is
  * engine logic (tested here); the driving is out-of-engine
  * (reference `selenium_client.py:93-194` keeps it outside the data
  * path too). */
class BrowserFetchSpec extends AnyFunSuite {

  private def tmpDir() = graft.SparkSpec.tempDir("graft_browser")

  test("fetchToLocal settles on the downloaded file once its size stabilizes") {
    val dir = tmpDir()
    // a browser double: the 'download' appears as an in-progress
    // .crdownload, grows, then renames to its final name — settle only
    // after the rename AND a stable size
    val partial = Paths.get(dir, "report.csv.crdownload")
    val done = Paths.get(dir, "report.csv")
    var step = 0
    val driver = new BrowserFetch.Driver {
      def trigger(url: String, downloadDir: String): Unit =
        Files.writeString(partial, "k,v\n")
    }
    val out = BrowserFetch.fetchToLocal(driver, "https://portal/export", dir,
      timeoutMs = 10000, pollMs = 1,
      sleep = _ => {
        step += 1
        if (step == 2) Files.writeString(partial, "k,v\n1,2\n")
        if (step == 3) Files.move(partial, done)
      })
    assert(out == done.toString)
    assert(Files.readString(Paths.get(out)) == "k,v\n1,2\n")
  }

  test("fetchToLocal ignores files that existed before the trigger") {
    val dir = tmpDir()
    Files.writeString(Paths.get(dir, "stale.csv"), "old")
    val driver = new BrowserFetch.Driver {
      def trigger(url: String, downloadDir: String): Unit =
        Files.writeString(Paths.get(downloadDir, "fresh.csv"), "new")
    }
    val out = BrowserFetch.fetchToLocal(driver, "u", dir,
      timeoutMs = 10000, pollMs = 1, sleep = _ => ())
    assert(out.endsWith("fresh.csv"))
  }

  test("fetchToLocal never settles on a Firefox-style 0-byte placeholder beside a .part") {
    val dir = tmpDir()
    // Firefox pre-creates an EMPTY `report.csv` next to the streaming
    // `report.csv.part` — fresh, suffix-free, 0-byte-size-stable: the
    // exact shape the r13 protocol settled on mid-download. The fix:
    // a partial-suffixed sibling sharing the name stem blocks settling,
    // and a 0-byte candidate never settles.
    val placeholder = Paths.get(dir, "report.csv")
    val part = Paths.get(dir, "report.csv.part")
    var step = 0
    val driver = new BrowserFetch.Driver {
      def trigger(url: String, downloadDir: String): Unit = {
        Files.writeString(placeholder, "")
        Files.writeString(part, "k,v\n")
      }
    }
    val out = BrowserFetch.fetchToLocal(driver, "u", dir,
      timeoutMs = 10000, pollMs = 1,
      sleep = _ => {
        step += 1
        if (step == 4) Files.writeString(part, "k,v\n1,2\n")
        if (step == 6) { Files.delete(placeholder); Files.move(part, placeholder) }
      })
    assert(out == placeholder.toString)
    assert(Files.readString(Paths.get(out)) == "k,v\n1,2\n",
      "must return the COMPLETE download, not the empty placeholder")
  }

  test("fetchToLocal times out rather than settle on a download that stays 0 bytes") {
    val dir = tmpDir()
    val driver = new BrowserFetch.Driver {
      def trigger(url: String, downloadDir: String): Unit =
        Files.writeString(Paths.get(downloadDir, "empty.csv"), "")
    }
    intercept[java.util.concurrent.TimeoutException] {
      BrowserFetch.fetchToLocal(driver, "u", dir,
        timeoutMs = 50, pollMs = 10, sleep = _ => ())
    }
  }

  test("fetchToLocal times out loudly when the download never completes") {
    val dir = tmpDir()
    val driver = new BrowserFetch.Driver {
      def trigger(url: String, downloadDir: String): Unit =
        Files.writeString(Paths.get(downloadDir, "stuck.xlsx.crdownload"), "partial")
    }
    intercept[java.util.concurrent.TimeoutException] {
      BrowserFetch.fetchToLocal(driver, "u", dir,
        timeoutMs = 50, pollMs = 10, sleep = _ => ())
    }
  }
}
