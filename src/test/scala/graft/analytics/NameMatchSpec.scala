package graft.analytics

import graft.SparkSpec

class NameMatchSpec extends SparkSpec {
  import spark.implicits._

  test("NFKD strips combining marks") {
    assert(NameMatch.nfkdStrip("hajičová") == "hajicova")
    assert(NameMatch.nfkdStrip("Müller") == "Muller")
    assert(NameMatch.nfkdStrip("plain") == "plain")
  }

  test("levenshtein distance") {
    assert(NameMatch.levenshtein("kitten", "sitting") == 3)
    assert(NameMatch.levenshtein("", "abc") == 3)
    assert(NameMatch.levenshtein("same", "same") == 0)
  }

  test("levenRatio matches python-Levenshtein ratio convention") {
    // ratio("kitten","sitting"): lensum=13, dist2 = 5 (2 subs=4 + 1 ins)
    assert(math.abs(NameMatch.levenRatio("kitten", "sitting") - 8.0 / 13) < 1e-12)
    assert(NameMatch.levenRatio("abc", "abc") == 1.0)
    assert(NameMatch.levenRatio("", "") == 1.0)
  }

  test("compare_name: documented match cases from the reference README") {
    // diacritics pair -> identical token sets -> subset rule -> 1.0
    assert(NameMatch.compareName("Eva Hajičová", "Eva Hajicova") == 1.0)
    // initials-form subset: tokens {j, van, wijk} ⊂ {jarke, j, van, wijk}
    assert(NameMatch.compareName("J. J. van Wijk", "Jarke J. van Wijk") == 1.0)
    // same name reordered
    assert(NameMatch.compareName("Rose Jeff", "jeff rose") == 1.0)
  }

  test("compare_name: near-identical names score above threshold") {
    val s = NameMatch.compareName("Shrikanth S. Narayanan", "Shrikanth Narayanan")
    assert(s == 1.0) // subset after preprocessing
    val s2 = NameMatch.compareName("Jeffrey Heer", "Jeffery Heer")
    assert(s2 > 0.96, s"got $s2")
  }

  test("compare_name: unrelated names score low") {
    val s = NameMatch.compareName("Alice Johnson", "Bob Smith")
    assert(s < 0.6, s"got $s")
  }

  test("pinyin segmentation") {
    assert(NameMatch.parsePinyin("wei")._2)
    assert(NameMatch.parsePinyin("zhang")._2)
    assert(!NameMatch.parsePinyin("smith")._2)
    assert(NameMatch.parsePinyin("weiming")._1 == Vector("wei", "ming"))
    // reference quirk preserved: 'iao' is missing from the finals list, so
    // "xiaoming" does NOT parse as pinyin (match_author.py:127)
    assert(!NameMatch.parsePinyin("xiaoming")._2)
  }

  test("matchPairs pipeline: blocking join finds the planted duplicates") {
    val authors = Seq(
      (1L, "Eva Hajičová"),
      (2L, "Eva Hajicova"),
      (3L, "Jeffrey Heer"),
      (4L, "Jeffery Heer"),
      (5L, "Benjamin Bach"),
      (6L, "Completely Different Person"),
      (7L, "Shrikanth S. Narayanan")
    ).toDF("id", "name")
    val got = NameMatch.matchPairs(authors).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(got.contains((1L, 2L)), s"expected diacritics pair in $got")
    assert(got.contains((3L, 4L)), s"expected typo pair in $got")
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L))
  }
}
