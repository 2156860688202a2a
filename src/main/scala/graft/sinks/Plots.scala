package graft.sinks

import java.awt.{BasicStroke, Color, Graphics2D, RenderingHints}
import java.awt.geom.{Ellipse2D, Line2D, Path2D}
import java.awt.image.BufferedImage
import java.io.File
import javax.imageio.ImageIO

/** S6 — PNG plot sinks (`/root/reference/AA-AR.py:177-248`,
  * `AA-Smurf.py:168-178` matplotlib figures), rendered with the JDK's
  * headless java2d: no plotting dependency exists in this stack, and none
  * is needed for scatter/line/spy raster output.
  *
  * These are presentation SINKS over already-computed result tables — the
  * semantics live in the tables (SURVEY S6); callers collect the (small,
  * already attention-filtered or capped) plot point sets and hand plain
  * sequences here. Nothing in this file touches Spark.
  */
object Plots {

  /** A point in plot space (for the 2-D figure: log10-transformed
    * coordinates, which the reference shows on log-scaled axes).
    */
  final case class P(x: Double, y: Double)

  private val marginL = 78
  private val marginR = 24
  private val marginT = 46
  private val marginB = 58

  private def canvas(w: Int, h: Int): (BufferedImage, Graphics2D) = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setRenderingHint(RenderingHints.KEY_ANTIALIASING,
      RenderingHints.VALUE_ANTIALIAS_ON)
    g.setColor(Color.WHITE)
    g.fillRect(0, 0, w, h)
    (img, g)
  }

  private def write(img: BufferedImage, out: File): Unit = {
    Option(out.getParentFile).foreach(_.mkdirs())
    ImageIO.write(img, "png", out)
    ()
  }

  private final class Axes(xs: Seq[Double], ys: Seq[Double],
                           w: Int, h: Int) {
    private def pad(lo: Double, hi: Double): (Double, Double) = {
      val span = math.max(hi - lo, 1e-9)
      (lo - 0.05 * span, hi + 0.05 * span)
    }
    val (x0, x1) = pad(xs.min, xs.max)
    val (y0, y1) = pad(ys.min, ys.max)
    def px(x: Double): Double =
      marginL + (x - x0) / (x1 - x0) * (w - marginL - marginR)
    def py(y: Double): Double =
      h - marginB - (y - y0) / (y1 - y0) * (h - marginT - marginB)
  }

  private def dot(g: Graphics2D, x: Double, y: Double, r: Double): Unit =
    g.fill(new Ellipse2D.Double(x - r, y - r, 2 * r, 2 * r))

  private def alpha(c: Color, a: Int): Color =
    new Color(c.getRed, c.getGreen, c.getBlue, a)

  /** Tick label for a log10-space coordinate: the reference draws raw
    * feature+1 values on log-scaled axes; integer log10 positions are
    * labeled as powers of ten.
    */
  private def powLabel(k: Int): String =
    if (k >= 0 && k <= 6) math.pow(10, k).toLong.toString else s"1e$k"

  private def frameAndTicks(g: Graphics2D, ax: Axes, w: Int, h: Int,
                            title: String, xLabel: String,
                            yLabel: String): Unit = {
    g.setColor(Color.BLACK)
    g.setStroke(new BasicStroke(1.2f))
    g.drawRect(marginL, marginT, w - marginL - marginR,
      h - marginT - marginB)
    g.setFont(g.getFont.deriveFont(15f))
    val fm = g.getFontMetrics
    (math.ceil(ax.x0).toInt to math.floor(ax.x1).toInt).foreach { k =>
      val x = ax.px(k)
      g.draw(new Line2D.Double(x, h - marginB, x, h - marginB + 5))
      val s = powLabel(k)
      g.drawString(s, (x - fm.stringWidth(s) / 2.0).toFloat,
        (h - marginB + 20).toFloat)
    }
    (math.ceil(ax.y0).toInt to math.floor(ax.y1).toInt).foreach { k =>
      val y = ax.py(k)
      g.draw(new Line2D.Double(marginL - 5, y, marginL, y))
      val s = powLabel(k)
      g.drawString(s, (marginL - 9 - fm.stringWidth(s)).toFloat,
        (y + fm.getAscent / 2.0 - 1).toFloat)
    }
    g.setFont(g.getFont.deriveFont(17f))
    val fm2 = g.getFontMetrics
    g.drawString(title, (w - fm2.stringWidth(title)) / 2f, 26f)
    g.drawString(xLabel, (w - fm2.stringWidth(xLabel)) / 2f, h - 12f)
    val old = g.getTransform
    g.rotate(-math.Pi / 2, 20, h / 2.0)
    g.drawString(yLabel, 20f - fm2.stringWidth(yLabel) / 2f, h / 2f)
    g.setTransform(old)
  }

  /** The per-figure 2-D attention plot (`AA-AR.py:177-220` twod_plot):
    * the full account cloud in blue, log-binned means as a green line,
    * the power-law fit as a red line, attended accounts as labeled red
    * markers, and each attended account's mean past position in purple
    * with an arrow to its current position. All coordinates arrive in
    * log10(feature+1) space; axes are labeled with the original powers of
    * ten, which is exactly matplotlib's log-log rendering of the raw
    * values.
    */
  def twodPlot(cloud: Seq[P], attended: Seq[(P, String)],
               past: Seq[(P, P)], binned: Seq[P],
               fitSlope: Double, fitIntercept: Double,
               title: String, xLabel: String, yLabel: String,
               out: File, w: Int = 1000, h: Int = 600): Unit = {
    require(cloud.nonEmpty, "twodPlot needs at least one point")
    val (img, g) = canvas(w, h)
    val all = cloud ++ attended.map(_._1) ++ past.map(_._1)
    val ax = new Axes(all.map(_.x), all.map(_.y), w, h)

    val blue = new Color(0x1f, 0x4e, 0xd8)
    cloud.foreach { p =>
      g.setColor(alpha(blue, 50)); dot(g, ax.px(p.x), ax.py(p.y), 7)
      g.setColor(blue); dot(g, ax.px(p.x), ax.py(p.y), 1.7)
    }

    if (binned.size >= 2) {
      val green = new Color(0x22, 0xa0, 0x4a)
      g.setColor(alpha(green, 140))
      g.setStroke(new BasicStroke(2.2f))
      val path = new Path2D.Double()
      binned.sortBy(_.x).zipWithIndex.foreach { case (p, i) =>
        if (i == 0) path.moveTo(ax.px(p.x), ax.py(p.y))
        else path.lineTo(ax.px(p.x), ax.py(p.y))
      }
      g.draw(path)
      binned.foreach(p => dot(g, ax.px(p.x), ax.py(p.y), 4))
    }

    if (!fitSlope.isNaN && !fitIntercept.isNaN) {
      g.setColor(new Color(0xd0, 0x20, 0x20))
      g.setStroke(new BasicStroke(3f))
      val xs = cloud.map(_.x)
      val (fx0, fx1) = (xs.min, xs.max)
      g.draw(new Line2D.Double(
        ax.px(fx0), ax.py(fitIntercept + fitSlope * fx0),
        ax.px(fx1), ax.py(fitIntercept + fitSlope * fx1)))
    }

    val purple = new Color(0x7a, 0x2c, 0xc0)
    past.foreach { case (pp, cur) =>
      g.setColor(alpha(purple, 120)); dot(g, ax.px(pp.x), ax.py(pp.y), 7)
      g.setColor(purple); dot(g, ax.px(pp.x), ax.py(pp.y), 2.5)
      g.setStroke(new BasicStroke(1.6f))
      g.draw(new Line2D.Double(ax.px(pp.x), ax.py(pp.y),
        ax.px(cur.x), ax.py(cur.y)))
    }

    val red = new Color(0xd0, 0x20, 0x20)
    g.setFont(g.getFont.deriveFont(16f))
    attended.foreach { case (p, label) =>
      g.setColor(alpha(red, 120)); dot(g, ax.px(p.x), ax.py(p.y), 8)
      g.setColor(red); dot(g, ax.px(p.x), ax.py(p.y), 3)
      g.drawString(label, (ax.px(p.x) + 8).toFloat, (ax.py(p.y) - 6).toFloat)
    }

    frameAndTicks(g, ax, w, h, title, xLabel, yLabel)
    g.dispose()
    write(img, out)
  }

  /** The change-score time series (`AA-AR.py:242-248`): one blue polyline
    * over window ids, linear axes.
    */
  def linePlot(series: Seq[(Long, Double)], title: String, xLabel: String,
               yLabel: String, out: File, w: Int = 1200,
               h: Int = 400): Unit = {
    require(series.nonEmpty, "linePlot needs at least one point")
    val pts = series.sortBy(_._1)
    val (img, g) = canvas(w, h)
    val ax = new Axes(pts.map(_._1.toDouble), pts.map(_._2), w, h)
    g.setColor(new Color(0x1f, 0x4e, 0xd8))
    g.setStroke(new BasicStroke(2f))
    val path = new Path2D.Double()
    pts.zipWithIndex.foreach { case ((x, y), i) =>
      if (i == 0) path.moveTo(ax.px(x.toDouble), ax.py(y))
      else path.lineTo(ax.px(x.toDouble), ax.py(y))
    }
    g.draw(path)
    // linear ticks: reuse the frame but with plain numeric labels
    g.setColor(Color.BLACK)
    g.setStroke(new BasicStroke(1.2f))
    g.drawRect(marginL, marginT, w - marginL - marginR,
      h - marginT - marginB)
    g.setFont(g.getFont.deriveFont(15f))
    val fm = g.getFontMetrics
    val nTicks = 6
    (0 to nTicks).foreach { i =>
      val xv = ax.x0 + (ax.x1 - ax.x0) * i / nTicks
      val x = ax.px(xv)
      g.draw(new Line2D.Double(x, h - marginB, x, h - marginB + 5))
      val s = f"$xv%.0f"
      g.drawString(s, (x - fm.stringWidth(s) / 2.0).toFloat,
        (h - marginB + 20).toFloat)
      val yv = ax.y0 + (ax.y1 - ax.y0) * i / nTicks
      val y = ax.py(yv)
      g.draw(new Line2D.Double(marginL - 5, y, marginL, y))
      val sy = f"$yv%.2f"
      g.drawString(sy, (marginL - 9 - fm.stringWidth(sy)).toFloat,
        (y + fm.getAscent / 2.0 - 1).toFloat)
    }
    g.setFont(g.getFont.deriveFont(17f))
    val fm2 = g.getFontMetrics
    g.drawString(title, (w - fm2.stringWidth(title)) / 2f, 26f)
    g.drawString(xLabel, (w - fm2.stringWidth(xLabel)) / 2f, h - 12f)
    val old = g.getTransform
    g.rotate(-math.Pi / 2, 20, h / 2.0)
    g.drawString(yLabel, 20f - fm2.stringWidth(yLabel) / 2f, h / 2f)
    g.setTransform(old)
    g.dispose()
    write(img, out)
  }

  /** Before/after adjacency spy pair (`AA-Smurf.py:168-178` matshow):
    * two n×n binary rasters side by side, black = edge. `before` cells
    * are (row, col) in original dense-index space; `positionOf` maps a
    * dense index to its reordered position for the right panel.
    */
  def spyPair(n: Int, before: Seq[(Int, Int)], positionOf: Int => Int,
              out: File, panel: Int = 520): Unit = {
    require(n > 0, "spyPair needs a non-empty matrix")
    val gap = 40
    val w = panel * 2 + gap * 3
    val h = panel + 70
    val (img, g) = canvas(w, h)
    val scale = panel.toDouble / n
    def drawPanel(x0: Int, cells: Seq[(Int, Int)], title: String): Unit = {
      g.setColor(Color.BLACK)
      g.setStroke(new BasicStroke(1.2f))
      g.drawRect(x0, 50, panel, panel)
      val cellPx = math.max(1.0, scale)
      cells.foreach { case (i, j) =>
        g.fillRect((x0 + j * scale).toInt, (50 + i * scale).toInt,
          math.ceil(cellPx).toInt, math.ceil(cellPx).toInt)
      }
      g.setFont(g.getFont.deriveFont(17f))
      val fm = g.getFontMetrics
      g.drawString(title, x0 + (panel - fm.stringWidth(title)) / 2f, 36f)
    }
    drawPanel(gap, before, "Before Reordering")
    drawPanel(panel + gap * 2,
      before.map { case (i, j) => (positionOf(i), positionOf(j)) },
      "After Reordering")
    g.dispose()
    write(img, out)
  }
}
