package graft

import graft.ext.TextOps
import org.apache.spark.sql.functions._

/** Gates for the mojibake repair family (q146):
  * [[graft.ext.TextOps.mojibakeOf]] is pinned against the JDK's own
  * windows-1252 decoder (non-circular — the table is hand-derived from
  * the public cp1252 layout, the JDK ships an independent one), the
  * repair round-trips the full repertoire, and clean text — including
  * text that CONTAINS repair targets like é — passes bit-unchanged.
  */
class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  private val cp1252 = java.nio.charset.Charset.forName("windows-1252")

  private def repair(s: String): (String, Long, Boolean) = {
    val r = TextOps.repairMojibake(Seq(s).toDF("text"), "text")
      .select(col("text_fixed"), col("chars_collapsed"),
        col("mojibake_changed")).head
    (r.getString(0), r.getLong(1), r.getBoolean(2))
  }

  test("mojibakeOf agrees with the JDK windows-1252 decoder") {
    // every char the repair table covers; the JDK decoder is the
    // independent gold reference for the defined byte range
    TextOps.MojibakeRepairs.foreach { case (scar, orig) =>
      assert(orig.length == 1)
      val jdk = new String(orig.getBytes("UTF-8"), cp1252)
      assert(scar == jdk,
        s"scar of U+${orig.head.toInt.toHexString} drifted: " +
          s"table='$scar' jdk='$jdk'")
    }
  }

  test("undefined cp1252 slots yield no table entry (U+201D, U+00C1)") {
    assert(TextOps.mojibakeOf('”').isEmpty) // trail byte 0x9D
    assert(TextOps.mojibakeOf('Á').isEmpty) // trail byte 0x81
    assert(!TextOps.MojibakeRepairs.exists(_._2 == "”"))
  }

  test("full-repertoire round trip: damage then repair is identity") {
    val clean = TextOps.MojibakeRepairs.map(_._2).mkString(" ")
    val damaged = clean.flatMap(c =>
      TextOps.mojibakeOf(c).getOrElse(c.toString))
    val (fixed, collapsed, changed) = repair(damaged)
    assert(fixed == clean)
    assert(changed)
    assert(collapsed == (damaged.length - clean.length).toLong)
  }

  test("clean text passes through bit-unchanged, even with repair targets") {
    val clean = "café – ‘déjà vu’ … plain ascii too."
    val (fixed, collapsed, changed) = repair(clean)
    assert(fixed == clean)
    assert(collapsed == 0L)
    assert(!changed)
  }

  test("three-byte scars repair before two-byte scars can half-eat them") {
    // "â€™" (scar of ’) contains no 2-byte scar by construction, but a
    // mixed string with adjacent scars must still restore exactly
    val clean = "l’été – 1€"
    val damaged = clean.flatMap(c =>
      TextOps.mojibakeOf(c).getOrElse(c.toString))
    assert(repair(damaged)._1 == clean)
  }

  test("chars_collapsed counts 1 per 2-byte and 2 per 3-byte scar") {
    val damaged = TextOps.mojibakeOf('é').get + TextOps.mojibakeOf('’').get
    val (fixed, collapsed, _) = repair(damaged)
    assert(fixed == "é’")
    assert(collapsed == 3L) // (2-1) + (3-1)
  }
}
