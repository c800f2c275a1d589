package graft.serve

import java.util.Locale

/** Chart rendering for the serve layer — the reference dashboard's
  * dual-axis figure (`streamlit/app.py:114-130`: Close on a blue left
  * axis, GDP growth rate on a red right axis, shared date x-axis)
  * re-expressed as dependency-free SVG.
  *
  * Engine boundary: rendering consumes the ALREADY-SLICED serving
  * frame (`StarServe.chartSeries` — filter-before-sort, KB-sized by
  * the date-range predicate), so the collect here is the same
  * serving-tier materialization the reference's `st.pyplot` does, not
  * a distributed-data anti-pattern. Output is deterministic: fixed
  * Locale.ROOT formatting, no timestamps, no randomness — the same
  * slice always renders byte-identical SVG (spec-asserted).
  */
object ChartRender {

  /** matplotlib's named colors used by the reference (app.py:117,123). */
  val TabBlue = "#1f77b4"
  val TabRed = "#d62728"

  private val W = 640
  private val H = 400
  // left/right pads fit the two y-axis tick labels; bottom fits dates.
  private val PadL = 64; private val PadR = 64
  private val PadT = 40; private val PadB = 48

  /** Titles/labels carry user data (index names) — XML-escape them. */
  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def fmt(v: Double): String = {
    val s = "%.2f".formatLocal(Locale.ROOT, v)
    if (s == "-0.00") "0.00" else s
  }

  /** Linear map of `v` in [lo,hi] to pixel span [a,b]; a constant
    * series (hi == lo) centers. */
  private def scale(v: Double, lo: Double, hi: Double,
      a: Double, b: Double): Double =
    if (hi == lo) (a + b) / 2.0 else a + (v - lo) / (hi - lo) * (b - a)

  /** One y-series against the shared x domain. `points` holds
    * (epochDay, value) with GAPS for missing values — the renderer
    * breaks the polyline at gaps exactly like matplotlib breaks at
    * NaN, so a year with no GDP reading doesn't draw a false bridge. */
  case class Series(label: String, color: String,
      segments: Seq[Seq[(Long, Double)]]) {
    def values: Seq[Double] = segments.flatten.map(_._2)
  }

  /** Split a nullable series into gap-free runs. */
  def segmentsOf(points: Seq[(Long, Option[Double])]): Seq[Seq[(Long, Double)]] = {
    val out = scala.collection.mutable.ArrayBuffer[Seq[(Long, Double)]]()
    var cur = scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    points.foreach {
      case (x, Some(v)) => cur += ((x, v))
      case (_, None) =>
        if (cur.nonEmpty) { out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer() }
    }
    if (cur.nonEmpty) out += cur.toSeq
    out.toSeq
  }

  /** Render the dual-axis chart. `rows` is the ordered serving slice:
    * (epochDay, Close, GDPGrowthRate), nulls as None. An empty slice
    * renders the reference's warning (`app.py:131`) as a text-only
    * SVG rather than an empty frame. */
  def dualAxis(title: String, rows: Seq[(Long, Option[Double], Option[Double])],
      leftLabel: String = "Close Price",
      rightLabel: String = "GDP Growth Rate (%)"): String = {
    if (rows.isEmpty)
      return s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H">""" +
        s"""<text x="${W / 2}" y="${H / 2}" text-anchor="middle" class="warning">""" +
        s"""No data found for the selected index</text></svg>"""

    val left = Series(esc(leftLabel), TabBlue,
      segmentsOf(rows.map(r => (r._1, r._2))))
    val right = Series(esc(rightLabel), TabRed,
      segmentsOf(rows.map(r => (r._1, r._3))))

    val xs = rows.map(_._1)
    val (x0, x1) = (xs.min, xs.max)
    def px(x: Long) = scale(x.toDouble, x0.toDouble, x1.toDouble, PadL, W - PadR)

    def axisBounds(s: Series): (Double, Double) = {
      val vs = s.values
      if (vs.isEmpty) (0.0, 1.0) else (vs.min, vs.max)
    }
    val (l0, l1) = axisBounds(left)
    val (r0, r1) = axisBounds(right)

    def polylines(s: Series, lo: Double, hi: Double): String =
      s.segments.map { seg =>
        val pts = seg.map { case (x, v) =>
          s"${fmt(px(x))},${fmt(scale(v, lo, hi, H - PadB, PadT))}"
        }.mkString(" ")
        // a 1-point run renders as a dot (matplotlib marker fallback)
        if (seg.size == 1)
          s"""<circle cx="${fmt(px(seg.head._1))}" cy="${fmt(scale(seg.head._2, lo, hi, H - PadB, PadT))}" r="2" fill="${s.color}"/>"""
        else
          s"""<polyline fill="none" stroke="${s.color}" stroke-width="1.5" points="$pts"/>"""
      }.mkString("\n  ")

    def yTicks(lo: Double, hi: Double, x: Int, anchor: String, color: String): String =
      Seq(lo, (lo + hi) / 2, hi).distinct.map { v =>
        val y = scale(v, lo, hi, H - PadB, PadT)
        s"""<text x="$x" y="${fmt(y + 4)}" text-anchor="$anchor" fill="$color" font-size="11">${fmt(v)}</text>"""
      }.mkString("\n  ")

    val epoch0 = java.time.LocalDate.ofEpochDay(x0)
    val epoch1 = java.time.LocalDate.ofEpochDay(x1)

    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" font-family="sans-serif">
  <text x="${W / 2}" y="24" text-anchor="middle" font-size="14">${esc(title)}</text>
  <rect x="$PadL" y="$PadT" width="${W - PadL - PadR}" height="${H - PadT - PadB}" fill="none" stroke="#cccccc"/>
  <text x="${W / 2}" y="${H - 12}" text-anchor="middle" font-size="12">Year</text>
  <text x="$PadL" y="${H - PadB + 16}" text-anchor="start" font-size="11">$epoch0</text>
  <text x="${W - PadR}" y="${H - PadB + 16}" text-anchor="end" font-size="11">$epoch1</text>
  <text transform="rotate(-90 16 ${H / 2})" x="16" y="${H / 2}" text-anchor="middle" font-size="12" fill="$TabBlue">${left.label}</text>
  <text transform="rotate(90 ${W - 16} ${H / 2})" x="${W - 16}" y="${H / 2}" text-anchor="middle" font-size="12" fill="$TabRed">${right.label}</text>
  ${yTicks(l0, l1, PadL - 6, "end", TabBlue)}
  ${yTicks(r0, r1, W - PadR + 6, "start", TabRed)}
  ${polylines(left, l0, l1)}
  ${polylines(right, r0, r1)}
</svg>"""
  }
}
