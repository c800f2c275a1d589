package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.serve.ChartRender

/** The serve-layer SVG renderer vs the reference figure semantics
  * (streamlit/app.py:114-131): dual axes, matplotlib tab colors,
  * gap-at-null polylines, the empty-slice warning, and byte-exact
  * determinism. Pure function — no SparkSession. */
class ChartRenderSpec extends AnyFunSuite {

  private val d0 = java.time.LocalDate.parse("2024-01-01").toEpochDay

  private def rows3 = Seq(
    (d0, Some(100.0), Some(2.0)),
    (d0 + 1, Some(150.0), Some(2.5)),
    (d0 + 2, Some(200.0), Some(3.0)))

  test("both series render with the reference's axis colors") {
    val svg = ChartRender.dualAxis("Close Price and GDP Growth - S&P500", rows3)
    assert(svg.contains(ChartRender.TabBlue) && svg.contains(ChartRender.TabRed))
    assert("<polyline".r.findAllIn(svg).length == 2)
    assert(svg.contains("Close Price and GDP Growth - S&amp;P500")
      || svg.contains("Close Price and GDP Growth - S&P500"))
    assert(svg.contains("Close Price") && svg.contains("GDP Growth Rate (%)")
      && svg.contains("Year"))
  }

  test("scaling is linear per axis: min at the bottom, max at the top") {
    val svg = ChartRender.dualAxis("t", rows3)
    // plot box: x in [64, 576], y in [40, 352] (H-PadB=352 is the min)
    val blue = svg.linesIterator.find(l =>
      l.contains("polyline") && l.contains(ChartRender.TabBlue)).get
    val pts = """points="([^"]+)"""".r.findFirstMatchIn(blue).get.group(1)
      .split(" ").map { p => val Array(x, y) = p.split(","); (x.toDouble, y.toDouble) }
    assert(pts.length == 3)
    // x spans the full box, evenly for evenly-spaced days
    assert(pts(0)._1 == 64.0 && pts(2)._1 == 576.0 && pts(1)._1 == 320.0)
    // y: 100 (min) at 352, 200 (max) at 40, 150 centered at 196
    assert(pts(0)._2 == 352.0 && pts(2)._2 == 40.0 && pts(1)._2 == 196.0)
  }

  test("a null reading breaks the line instead of bridging it") {
    val gappy = Seq(
      (d0, Some(1.0), Some(2.0)),
      (d0 + 1, Some(2.0), None), // matplotlib NaN gap
      (d0 + 2, Some(3.0), Some(4.0)))
    val svg = ChartRender.dualAxis("t", gappy)
    // blue: one 3-point polyline; red: two 1-point runs → dots
    assert("<polyline".r.findAllIn(svg).length == 1)
    assert("<circle".r.findAllIn(svg).length == 2)
    assert(ChartRender.segmentsOf(gappy.map(r => (r._1, r._3))) ==
      Seq(Seq((d0, 2.0)), Seq((d0 + 2, 4.0))))
  }

  test("constant series centers; single row renders as markers") {
    val flat = Seq((d0, Some(5.0), Some(1.0)), (d0 + 1, Some(5.0), Some(1.0)))
    val svg = ChartRender.dualAxis("t", flat)
    // constant close → horizontal line at the vertical center (196)
    assert(svg.contains("196.00"))
    val one = ChartRender.dualAxis("t", Seq((d0, Some(5.0), Some(1.0))))
    assert("<circle".r.findAllIn(one).length == 2)
  }

  test("empty slice renders the reference warning, not an empty frame") {
    val svg = ChartRender.dualAxis("t", Nil)
    assert(svg.contains("No data found for the selected index"))
    assert(!svg.contains("polyline"))
  }

  test("rendering is deterministic byte-for-byte") {
    val a = ChartRender.dualAxis("t", rows3)
    val b = ChartRender.dualAxis("t", rows3)
    assert(a == b)
  }
}
