package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Export-side color math from the reference's topic visualization.
  *
  * X10 — HSV -> RGB hex (vis/process.py:38-67, JS twin vis/graph.js:23-40)
  * and the topic coloring h = atan2 angle, s = normalized distance, v = 1
  * (topic/color_topic.py:12-37). Pure Scala, exposed as both functions
  * over (Double, Double, Double) and Columns via a deterministic UDF.
  */
object ColorFunctions {

  /** Classic HSV->RGB (h in [0,360), s,v in [0,1]) -> "#rrggbb". */
  def hsvToHex(h: Double, s: Double, v: Double): String = {
    val hh = ((h % 360) + 360) % 360 / 60.0
    val i = hh.toInt % 6
    val f = hh - hh.toInt
    val p = v * (1 - s)
    val q = v * (1 - f * s)
    val t = v * (1 - (1 - f) * s)
    val (r, g, b) = i match {
      case 0 => (v, t, p)
      case 1 => (q, v, p)
      case 2 => (p, v, t)
      case 3 => (p, q, v)
      case 4 => (t, p, v)
      case _ => (v, p, q)
    }
    f"#${(r * 255).round.toInt}%02x${(g * 255).round.toInt}%02x${(b * 255).round.toInt}%02x"
  }

  val hsvToHexUdf = udf(hsvToHex _)

  /** Topic (x, y) -> (h, s, v): hue from atan2 in degrees, saturation =
    * distance normalized by maxNorm, v = 1 (color_topic.py:26-32).
    */
  def xyToHsv(x: Column, y: Column, maxNorm: Column): (Column, Column, Column) = {
    val h = (degrees(atan2(y, x)) + 360.0) % 360.0
    val s = least(sqrt(x * x + y * y) / maxNorm, lit(1.0))
    (h, s, lit(1.0))
  }
}
