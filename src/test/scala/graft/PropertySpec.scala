package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup
import graft.functions.Text

/** Property-based algebraic laws — SURVEY.md §5.2(3). ScalaCheck
  * generators drawn with fixed seeds (scalatestplus glue isn't in the
  * offline cache, so sampling is driven manually — same laws, same
  * generator space, deterministic).
  */
class PropertySpec extends AnyFunSuite {
  import SharedSpark._

  private def draws[A](gen: Gen[A], n: Int = 5): Seq[A] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
  private val doc = Gen.listOfN(8, word).map(_.mkString(" "))
  private val corpus = Gen.listOfN(10, doc)

  test("D4 dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    import spark.implicits._
    draws(corpus).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = Dedup.exactDedup(df, "doc_id", "text")
      val twice = Dedup.exactDedup(once, "doc_id", "text")
      assert(twice.except(once).isEmpty && once.except(twice).isEmpty)
      val kept = once.select("text").collect().map(_.getString(0))
      assert(kept.toSet.size == kept.length)
    }
  }

  test("J16a BandJoinRewrite law: rewritten join equals a driver-side pair scan") {
    import spark.implicits._
    // random values + random epsilon: the optimizer-rewritten join must
    // return EXACTLY the pairs a brute-force reference finds, including
    // negative values and band-boundary cases
    val eps = Seq(0.05, 0.3, 1.0)
    val values = Gen.listOfN(120, Gen.chooseNum(-500, 500).map(_ / 7.0))
    draws(Gen.zip(values, Gen.oneOf(eps))).foreach { case (vs, e) =>
      val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val df = rows.toDF("id", "v")
      val a = df.select($"id".as("ida"), $"v".as("va"))
      val b = df.select($"id".as("idb"), $"v".as("vb"))
      val joined = a.join(b, $"ida" =!= $"idb" && abs($"va" - $"vb") <= e)
        .select($"ida", $"idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        (ia, va) <- rows; (ib, vb) <- rows
        if ia != ib && math.abs(va - vb) <= e
      } yield (ia, ib)).toSet
      assert(joined == expected,
        s"eps=$e: missing=${(expected -- joined).take(5)} extra=${(joined -- expected).take(5)}")
    }
  }

  test("D8/A1 upsert law: latest(append(d, next)) == latest(d) + 1") {
    import spark.implicits._
    draws(Gen.listOfN(12, Gen.chooseNum(1, 5))).foreach { versions =>
      val df = versions.zipWithIndex
        .map { case (v, i) => (s"f${i % 3}", v) }.toDF("filename", "version")
      val latest = df.groupBy($"filename").agg(max($"version").as("v"))
      val upserted = df.unionByName(
        latest.select($"filename", ($"v" + 1).as("version")))
      val after = upserted.groupBy($"filename").agg(max($"version").as("v"))
      val bad = latest.as("l").join(after.as("a"), "filename")
        .filter(col("a.v") =!= col("l.v") + 1)
      assert(bad.isEmpty)
    }
  }

  test("U1/U3 set law: (a except b) union (a intersect b) == distinct a, b ⊆ a") {
    import spark.implicits._
    val pair = Gen.zip(Gen.nonEmptyListOf(Gen.chooseNum(0, 20)),
      Gen.listOf(Gen.chooseNum(0, 20)))
    draws(pair).foreach { case (as, bsRaw) =>
      val a = as.toDF("k")
      val b = bsRaw.toDF("k").intersect(a) // force b ⊆ a
      val rebuilt = a.except(b).union(a.distinct().intersect(b)).distinct()
      assert(rebuilt.except(a.distinct()).isEmpty &&
        a.distinct().except(rebuilt).isEmpty)
    }
  }

  test("D2/D5 shingle law: 0 shingles iff tokens < n; count == tokens - n + 1") {
    import spark.implicits._
    draws(Gen.zip(Gen.listOf(word), Gen.chooseNum(2, 4)), 8).foreach { case (tokens, n) =>
      val df = Seq(tokens.mkString(" ")).toDF("text")
      val got = df.select(
        size(Text.tokenize($"text")).as("nt"),
        size(Text.shingles(Text.tokenize($"text"), n)).as("ns")
      ).head()
      val (nt, ns) = (got.getInt(0), got.getInt(1))
      assert(if (nt < n) ns == 0 else ns == nt - n + 1, s"nt=$nt n=$n ns=$ns")
    }
  }

  test("D5 minhash estimate is 1 for identical docs") {
    import spark.implicits._
    draws(doc).foreach { t =>
      val df = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
      val est = Dedup.minhashPairs(df, 3, 8, 2, 0.0)
        .select("est_jaccard").collect()
      assert(est.length == 1 && est.head.getDouble(0) == 1.0)
    }
  }

  test("W1 ≡ A1: top-1-by-version window equals groupBy max") {
    import spark.implicits._
    draws(Gen.listOfN(15, Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(1, 9)))).foreach { rows =>
      val df = rows.distinct.map { case (f, v) => (s"f$f", v) }
        .toDF("filename", "version")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"filename").orderBy($"version".desc)
      val w1 = df.withColumn("rn", row_number().over(w))
        .filter($"rn" === 1).select($"filename", $"version")
      val a1 = df.groupBy($"filename").agg(max($"version").as("version"))
      assert(w1.except(a1).isEmpty && a1.except(w1).isEmpty)
    }
  }

  test("P3 ⊆ S1: any regex filter result is a subset of the full scan") {
    import spark.implicits._
    draws(Gen.zip(corpus, Gen.oneOf("^a", "ta$", "e", "zz", "a.*a")), 8)
      .foreach { case (texts, pat) =>
        val df = texts.toDF("text")
        assert(df.filter($"text".rlike(pat)).except(df).isEmpty)
      }
  }

  test("D10 chunking law: dropping each chunk's overlap reconstructs the token stream") {
    import spark.implicits._
    // window 50 / stride 40: chunks after the first re-carry the last 10
    // tokens of their predecessor; removing that overlap and concatenating
    // in chunk order must reproduce the original tokenization exactly
    val longDoc = Gen.listOfN(137, word).map(_.mkString(" "))
    draws(longDoc, 4).foreach { text =>
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val chunks = df
        .select(col("doc_id"), Text.tokenize(col("text")).as("tokens"))
        .filter(size(col("tokens")) >= 1)
        .select(col("doc_id"), col("tokens"),
          explode(sequence(lit(1), size(col("tokens")), lit(40))).as("s"))
        .select(col("s"), slice(col("tokens"), col("s"), lit(50)).as("chunk"))
        .orderBy(col("s"))
        .collect()
      val rebuilt = chunks.zipWithIndex.flatMap { case (r, i) =>
        val c = r.getSeq[String](1)
        if (i == 0) c else c.drop(10) // stride 40 of window 50 => 10 overlap
      }.toList
      val expected = text.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toList
      assert(rebuilt == expected)
    }
  }

  test("D11 sampling laws: deterministic, monotone in rate, exact at 0 and 100") {
    import spark.implicits._
    val ids = (0L until 400L).toDF("doc_id")
    def kept(pct: Int): Set[Long] = ids.filter(
      pmod(conv(substring(md5($"doc_id".cast("string")), 1, 15), 16, 10)
        .cast("long"), lit(100L)) < pct)
      .as[Long].collect().toSet
    assert(kept(0).isEmpty && kept(100).size == 400)
    // re-evaluation returns the identical sample (no RNG state)
    assert(kept(35) == kept(35))
    // monotone: a higher rate strictly contains every lower-rate sample
    val k20 = kept(20); val k50 = kept(50); val k80 = kept(80)
    assert(k20.subsetOf(k50) && k50.subsetOf(k80))
    // rate is honored within bucket granularity on uniform buckets
    assert(math.abs(k50.size / 400.0 - 0.5) < 0.15)
  }

  test("D1 codec robustness: arbitrary bytes never hang, crash, or mis-sniff") {
    // the round-3 WAV advice class of bug: corrupt sizes/headers must
    // produce None / a safe sniff, never an infinite chunk walk or OOB.
    // Mix pure-random bytes with adversarial mutations of VALID headers
    // (truncations, huge chunk sizes, zero/negative dims).
    val mm = graft.multimodal.Multimodal
    val validBmp = mm.synthBmp(7L, 4, 3)
    val validWav = mm.synthWav(7L, 32)
    val validPng = mm.synthPng(7L, 4, 6)
    val validGif = mm.synthGif(7L, 4, 4, 2)
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(200)(Array.fill(rnd.nextInt(200))(rnd.nextInt.toByte)) ++
      Seq(validBmp, validWav, validPng, validGif).flatMap { v =>
        (0 until 100).map { i =>
          val m = v.clone()
          val r = new scala.util.Random(i)
          // mutate 1-4 bytes anywhere (headers, sizes, dims, data)
          (0 to r.nextInt(4)).foreach(_ => m(r.nextInt(m.length)) = r.nextInt.toByte)
          if (i % 7 == 0) m.take(r.nextInt(m.length)) else m
        }
      }
    cases.foreach { bytes =>
      // must terminate and never throw — result content is unconstrained
      val s = graft.functions.Metadata.sniff(bytes)
      assert(s.contains("length") || bytes == null)
      mm.decodeBmp(bytes)
      mm.decodeWav(bytes)
      mm.decodePng(bytes) // zlib/filter corruption must yield None, not throw
      mm.decodeGif(bytes) // LZW/block corruption must terminate, not loop
      mm.resizeBmpNearest(bytes, 2, 2).foreach { out =>
        assert(mm.decodeBmp(out).isDefined) // any resize output re-decodes
      }
    }
  }

  test("D4 bloom novelty laws: zero false negatives; FP rate bounded") {
    import spark.implicits._
    val corpus = (1 to 300).map(i => s"doc body $i").toDF("k")
    val novel = (1 to 300).map(i => s"unseen text $i").toDF("k")
    val bloom = Dedup.bloomWords(corpus, "k", words = 32, numHashes = 3)
    // the filter itself is tiny and fully populated from the corpus only
    assert(bloom.count() <= 32)
    val verdict = Dedup.bloomProbe(corpus.union(novel), "k", bloom,
        words = 32, numHashes = 3)
      .as[(String, Boolean)].collect().toMap
    // no false negatives, EVER — every corpus key must be flagged
    assert((1 to 300).forall(i => verdict(s"doc body $i")))
    // false positives exist by design but stay under the load-factor
    // bound (n=300, m=1984, k=3 -> theoretical ~6%; allow generous slack)
    val fp = (1 to 300).count(i => verdict(s"unseen text $i"))
    assert(fp.toDouble / 300 < 0.25, s"fp=$fp")
    // duplicate probe keys must not flip the verdict: a repeated
    // corpus-present key doubles every hit row, and a count-based verdict
    // (sum === k) would then report it novel — the false negative the
    // guarantee forbids. Probe each corpus key twice in one frame.
    val dupVerdict = Dedup.bloomProbe(corpus.union(corpus).union(novel), "k",
        bloom, words = 32, numHashes = 3)
      .as[(String, Boolean)].collect().toMap
    assert((1 to 300).forall(i => dupVerdict(s"doc body $i")),
      "duplicate probe keys produced a false negative")
  }

  test("A6 Misra-Gries law: items above n/(k+1) always survive, any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    (0 until 3).foreach { trial =>
      // skewed stream: a few hot items + a long random tail
      val hot = (0 until 5).flatMap(h => Seq.fill(200 + rnd.nextInt(300))(s"hot$h"))
      val tail = Seq.fill(2000)(s"t${rnd.nextInt(800)}")
      val stream = rnd.shuffle(hot ++ tail)
      val n = stream.size
      val k = 64
      val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
      val mg = udaf(new graft.functions.MisraGries(k),
        org.apache.spark.sql.Encoders.STRING)
      // vary the partitioning so partial/merge order differs per trial
      val cands = stream.toDF("t").repartition(3 + trial * 7)
        .agg(mg(col("t")).as("c"))
        .select(explode(col("c")).as("t")).as[String].collect().toSet
      assert(cands.size <= k)
      val mustSurvive = exact.collect { case (t, c) if c.toLong * (k + 1) > n => t }
      assert(mustSurvive.nonEmpty, "trial degenerate: no heavy items")
      val lost = mustSurvive.filterNot(cands)
      assert(lost.isEmpty, s"MG false negatives: $lost")
    }
  }

  test("D5e CC law: star variant and propagation agree on random graphs") {
    import spark.implicits._
    // both algorithms must compute the identical min-label components on
    // arbitrary sparse graphs (incl. disconnected nodes and multi-edges)
    val edgeGen = Gen.listOfN(10,
      Gen.zip(Gen.chooseNum(0L, 11L), Gen.chooseNum(0L, 11L))).map(
      _.filter { case (a, b) => a != b })
    draws(edgeGen).foreach { es =>
      if (es.nonEmpty) {
        val edges = es.toDF("a", "b")
        val prop = Dedup.connectedComponents(edges)
          .as[(Long, Long)].collect().toMap
        val star = Dedup.connectedComponentsLogStar(edges)
          .as[(Long, Long)].collect().toMap
        assert(prop == star, s"disagree on $es")
      }
    }
  }

  test("D5e CC laws: labels are a fixpoint; relabeling the graph is idempotent") {
    import spark.implicits._
    // random sparse graphs over 12 nodes
    val edgeGen = Gen.listOfN(10,
      Gen.zip(Gen.chooseNum(0L, 11L), Gen.chooseNum(0L, 11L))).map(
      _.filter { case (a, b) => a != b })
    draws(edgeGen).foreach { es =>
      val edges = es.toDF("a", "b")
      val comp = Dedup.connectedComponents(edges)
      // fixpoint: every edge's endpoints share a component label
      val la = comp.select(col("id").as("a"), col("comp").as("ca"))
      val lb = comp.select(col("id").as("b"), col("comp").as("cb"))
      val split = edges.join(la, "a").join(lb, "b")
        .filter(col("ca") =!= col("cb"))
      assert(split.isEmpty, "edge endpoints in different components")
      // idempotence: rerunning CC over comp-labeled edges changes nothing
      val again = Dedup.connectedComponents(
        edges.join(la, "a").join(lb, "b")
          .select(col("ca").as("a"), col("cb").as("b")))
      // all relabeled edges are (c, c) self-loops, so CC over them is the
      // identity labeling — each component label maps to itself
      assert(again.filter(col("id") =!= col("comp")).isEmpty)
    }
  }

  test("D6q quantization law: dequantized values within half a step of the input") {
    import spark.implicits._
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-1000, 1000).map(_ / 250.0f))
    draws(vecGen).foreach { vs =>
      val df = Seq((1L, vs.toArray)).toDF("id", "v")
        .select(col("id"), col("v"),
          graft.functions.Vectors.quantizeInt8(col("v")).as("q"),
          graft.functions.Vectors.quantScale(col("v")).as("s"))
      val row = df.collect().head
      val orig = row.getSeq[Float](1)
      val q = row.getSeq[Long](2)
      val s = row.getDouble(3)
      assert(q.forall(x => x >= -127 && x <= 127))
      if (s > 0)
        orig.zip(q).foreach { case (x, qi) =>
          assert(math.abs(qi * s - x) <= s / 2 + 1e-9,
            s"dequant error beyond half step: x=$x q=$qi s=$s")
        }
    }
  }

  test("D10 packing law: every shard except a source's last is filled past budget - max_doc") {
    import spark.implicits._
    // greedy cumsum packing: a shard only closes when adding the next doc
    // crosses the budget, so a non-final shard holds > budget - maxdoc tokens
    val docs = draws(Gen.listOfN(40, Gen.chooseNum(50, 900)), n = 3)
    docs.foreach { sizes =>
      val budget = 1000L
      val df = sizes.zipWithIndex.map { case (n, i) => (i.toLong, n.toLong) }
        .toDF("doc_id", "n_tok")
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val shards = df
        .withColumn("shard", floor((sum(col("n_tok")).over(w) - col("n_tok")) / lit(budget)))
        .groupBy("shard").agg(sum(col("n_tok")).as("tok"))
        .orderBy("shard").as[(Long, Long)].collect()
      val maxDoc = sizes.max
      shards.dropRight(1).foreach { case (sid, tok) =>
        assert(tok > budget - maxDoc,
          s"shard $sid underfilled: $tok of $budget (maxdoc $maxDoc)")
      }
      assert(shards.map(_._2).sum == sizes.map(_.toLong).sum) // nothing lost
    }
  }

  test("D11 split law: train/val/test partition the corpus and are growth-stable") {
    import spark.implicits._
    def split(ids: Seq[Long]) = {
      val b = pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long"), lit(100L))
      ids.toDF("doc_id")
        .select(col("doc_id"),
          when(b < 80, "train").when(b < 90, "val").otherwise("test").as("s"))
        .as[(Long, String)].collect().toMap
    }
    val small = split(0L until 300L)
    val grown = split(0L until 600L)
    // disjoint + exhaustive by construction; stability: growing the corpus
    // never reassigns an existing doc's split
    assert(small.forall { case (id, s) => grown(id) == s })
    assert(small.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("G1 PageRank law: total rank is conserved EXACTLY at every iteration") {
    import spark.implicits._
    // same dyadic-exact arithmetic as g1_pagerank (out-degree 4, damping
    // 7/8): sum of ranks stays exactly N — in exact IEEE equality, which
    // only holds because every intermediate is a short-mantissa dyadic
    val n = 97L
    val docs = (0L until n).toDF("doc_id")
    val edges = docs.select(col("doc_id").as("src"),
      explode(array((0 until 4).map(k =>
        (col("doc_id") * 31 + k * 17 + 7) % n): _*)).as("dst"))
    var ranks = docs.select(col("doc_id"), lit(1.0).as("pr"))
    for (_ <- 1 to 4) {
      val contribs = edges.join(ranks, col("src") === col("doc_id"))
        .select(col("dst"), (col("pr") / 4).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cin"))
      ranks = docs.join(contribs, col("doc_id") === col("dst"), "left")
        .select(col("doc_id"),
          (lit(0.125) + lit(0.875) * coalesce(col("cin"), lit(0.0))).as("pr"))
      val total = ranks.agg(sum(col("pr"))).as[Double].head()
      assert(total == n.toDouble, s"rank mass drifted: $total != $n")
    }
  }

  test("O4 skyline laws: sound (nothing dominated) and complete (covers the rest)") {
    import spark.implicits._
    val pts = draws(Gen.listOfN(120,
      Gen.zip(Gen.choose(0, 30), Gen.choose(0, 30))), 3)
    pts.foreach { ps =>
      val df = ps.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
        .toDF("id", "x", "y")
      val sky = graft.queries.Windows.skyline2d(df, "x", "y", "id")
        .select("id", "x", "y").as[(Long, Int, Int)].collect()
      val all = ps.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      def dominates(a: (Long, Int, Int), b: (Long, Int, Int)) =
        a._2 >= b._2 && a._3 >= b._3 && (a._2 > b._2 || a._3 > b._3)
      // soundness: no output point strictly dominated by ANY input point
      sky.foreach(s => assert(!all.exists(p => dominates(p, s)), s"$s dominated"))
      // completeness: every non-output point is dominated by (or an
      // equal-coordinate duplicate of) some output point
      val skySet = sky.map(_._1).toSet
      all.filterNot(p => skySet(p._1)).foreach { p =>
        assert(sky.exists(s => dominates(s, p) ||
          (s._2 == p._2 && s._3 == p._3)), s"$p uncovered")
      }
    }
  }

  test("W6 EWMA law: appending one value updates the fold as s/2 + v") {
    import spark.implicits._
    val seqs = draws(Gen.listOfN(20, Gen.choose(0.0, 100.0)), 4)
    def fold(vs: Seq[Double]): Double = {
      Seq(vs).toDF("vals")
        .select(aggregate(col("vals"), lit(0.0), (a, x) => a / 2 + x))
        .as[Double].head()
    }
    seqs.foreach { vs =>
      val s = fold(vs)
      val v = 7.25
      assert(fold(vs :+ v) == s / 2 + v) // exact: /2 is an exponent shift
    }
  }

  test("A13 bitmap-distinct law: popcount sum equals exact distinct on random ids") {
    import spark.implicits._
    draws(Gen.listOfN(300, Gen.choose(0L, 5000L)), 4).foreach { ids =>
      val df = ids.toDF("user_id")
      val bitmap = df
        .groupBy(expr("user_id DIV 63").as("word"))
        .agg(expr("bit_or(shiftleft(1L, cast(user_id % 63 as int)))").as("bits"))
        .agg(sum(bit_count(col("bits")))).as[Long].head()
      assert(bitmap == ids.distinct.size.toLong,
        s"bitmap $bitmap != exact ${ids.distinct.size}")
    }
  }

  test("J17 bucketed interval join law: equals the direct theta join on random intervals") {
    import spark.implicits._
    // random interval sets; the cell-bucketed plan must reproduce the
    // nested-loop overlap pairs exactly (each pair once)
    val gen = Gen.listOfN(40, for {
      s <- Gen.choose(0L, 200L); len <- Gen.choose(1L, 7L)
    } yield (s, s + len))
    draws(gen, 4).foreach { iv =>
      val a = iv.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
        .toDF("a_id", "a_s", "a_e")
      val b = iv.reverse.zipWithIndex.map { case ((s, e), i) =>
        (1000L + i, s + 1, s + 1 + (e - s)) }.toDF("b_id", "b_s", "b_e")
      val w = 7L
      def cells(s: org.apache.spark.sql.Column, e: org.apache.spark.sql.Column) =
        explode(sequence(floor(s / w).cast("long"), floor((e - 1) / w).cast("long")))
      val ax = a.select(col("a_id"), col("a_s"), col("a_e"),
        cells(col("a_s"), col("a_e")).as("cell"))
      val bx = b.select(col("b_id"), col("b_s"), col("b_e"),
        cells(col("b_s"), col("b_e")).as("cell"))
      val bucketed = ax.join(bx, Seq("cell"))
        .filter(col("cell") === floor(greatest(col("a_s"), col("b_s")) / w).cast("long"))
        .filter(col("a_s") < col("b_e") && col("b_s") < col("a_e"))
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val direct = a.join(b, col("a_s") < col("b_e") && col("b_s") < col("a_e"))
        .select("a_id", "b_id").as[(Long, Long)].collect()
      assert(direct.length == direct.toSet.size) // sanity: theta join emits once
      assert(bucketed == direct.toSet,
        s"bucketed/direct diverge: ${(bucketed -- direct.toSet).take(3)} / ${(direct.toSet -- bucketed).take(3)}")
    }
  }

  test("D5y yield-curve law: pair and removal counts are non-increasing in the threshold") {
    import spark.implicits._
    val rows = SparkEntry.queries("d5_dedup_yield_curve")(spark, sf)
      .orderBy(col("t10")).select("n_pairs", "n_docs_removed")
      .as[(Long, Long)].collect()
    assert(rows.length == 7)
    rows.sliding(2).foreach { case Array((p1, d1), (p2, d2)) =>
      assert(p2 <= p1 && d2 <= d1, s"yield curve not monotone: ${rows.toSeq}")
    }
  }

  test("D11 mixture-planner laws: quotas conserve the budget; caps bind exactly") {
    import spark.implicits._
    val rows = SparkEntry.queries("d11_mixture_planner")(spark, sf)
      .select("n_tokens", "wt", "quota_tokens", "epochs_x100", "capped",
        "achievable_tokens")
      .as[(Long, Long, Long, Long, Int, Long)].collect()
    val t = rows.map(_._1).sum
    val tw = rows.map(_._2).sum
    rows.foreach { case (n, w, q, e, cap, ach) =>
      assert(q == t * w / tw) // integer quota definition
      assert(e == q * 100 / n)
      assert((cap == 1) == (e > 400), "cap flag must bind exactly at 4 epochs")
      assert(ach == math.min(q, 4 * n))
    }
    // floor quotas never exceed the budget
    assert(rows.map(_._3).sum <= t)
  }

  test("T10 funnel law: out-of-order stages never convert") {
    import spark.implicits._
    def ts(m: Long) = new java.sql.Timestamp(m * 60000L)
    val ev = Seq(
      // user 1: click BEFORE the first view — must not count as depth 2
      (1L, "click", ts(1)), (1L, "view", ts(2)), (1L, "purchase", ts(3)),
      // user 2: the full ordered funnel
      (2L, "view", ts(1)), (2L, "click", ts(2)), (2L, "purchase", ts(3)),
      // user 3: purchase between view and click — click converts, purchase doesn't
      (3L, "view", ts(1)), (3L, "purchase", ts(2)), (3L, "click", ts(3)),
      // user 4: never viewed — not in the funnel at all
      (4L, "click", ts(1)), (4L, "purchase", ts(2))
    ).toDF("user_id", "event_type", "ts")
    val out = graft.queries.EventOps.funnel(ev)
      .select("user_id", "depth").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 1, 2L -> 3, 3L -> 2))
  }

  test("J19 spatial grid law: 3x3 cell join equals the direct theta join on random points") {
    import spark.implicits._
    val gen = Gen.listOfN(60, for {
      x <- Gen.choose(0L, 500L); y <- Gen.choose(0L, 500L)
    } yield (x, y))
    draws(gen, 4).foreach { pts =>
      val p = pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
        .toDF("id", "x", "y")
      val r = 60L // cell size == radius: adjacency capture is exact
      val probe = p.select(col("id").as("id2"), col("x").as("x2"),
        col("y").as("y2"), (col("x") / r).cast("long").as("cx"),
        (col("y") / r).cast("long").as("cy"))
      val build = p.select(col("id").as("id1"), col("x").as("x1"),
          col("y").as("y1"),
          explode(expr(
            s"""flatten(transform(sequence(-1, 1), dx ->
               |  transform(sequence(-1, 1), dy ->
               |    struct(x DIV $r + dx AS cx, y DIV $r + dy AS cy))))"""
              .stripMargin)).as("cell"))
        .select(col("id1"), col("x1"), col("y1"),
          col("cell.cx").as("cx"), col("cell.cy").as("cy"))
      val d2 = (col("x1") - col("x2")) * (col("x1") - col("x2")) +
        (col("y1") - col("y2")) * (col("y1") - col("y2"))
      val grid = build.join(probe, Seq("cx", "cy"))
        .filter(col("id1") < col("id2") && d2 <= r * r)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val direct = p.select(col("id").as("id1"), col("x").as("x1"),
          col("y").as("y1"))
        .join(p.select(col("id").as("id2"), col("x").as("x2"),
          col("y").as("y2")), col("id1") < col("id2") && d2 <= r * r)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(grid == direct, s"grid join lost/duplicated pairs: " +
        s"missing=${direct -- grid} extra=${grid -- direct}")
    }
  }

  test("S18 CMS join-size law: the sketch estimate never undershoots the exact size") {
    import spark.implicits._
    val gen = for {
      a <- Gen.listOfN(200, Gen.choose(0L, 80L))
      b <- Gen.listOfN(200, Gen.choose(0L, 80L))
    } yield (a, b)
    def bucket(seed: Int, key: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(s"$seed:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 15), 16) % 64
    }
    draws(gen, 4).foreach { case (as, bs) =>
      val ca = as.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cb = bs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val exact = ca.map { case (k, n) => n * cb.getOrElse(k, 0L) }.sum
      val est = (0 until 4).map { seed =>
        val ska = ca.groupMapReduce { case (k, _) => bucket(seed, k) }(_._2)(_ + _)
        val skb = cb.groupMapReduce { case (k, _) => bucket(seed, k) }(_._2)(_ + _)
        ska.map { case (w, n) => n * skb.getOrElse(w, 0L) }.sum
      }.min
      assert(est >= exact, s"CMS inner product $est < exact $exact")
    }
  }

  test("J20 lerp laws: observed days are exact; interpolations stay inside the bracket") {
    import spark.implicits._
    // random sparse series -> the registry shape on a tiny synthetic frame
    val gen = Gen.listOfN(8, for {
      d <- Gen.choose(0L, 30L); v <- Gen.choose(1, 9)
    } yield (d, v.toDouble))
    draws(gen, 4).foreach { obsRaw =>
      val obs = obsRaw.toMap.toSeq // unique days
      val o = obs.map { case (d, v) => (1L, d, v) }.toDF("user_id", "d", "v")
      val grid = o.groupBy(col("user_id"))
        .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
        .select(col("user_id"), explode(expr("sequence(d0, d1)")).as("d"))
      val g = grid.join(o.select(col("user_id").as("ou"), col("d").as("od"),
          col("v")), col("user_id") === col("ou") && col("d") === col("od"),
          "left")
        .select(col("user_id"), col("d"), col("v"))
      val wp = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("d"))
        .rowsBetween(Long.MinValue, 0)
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("d"))
        .rowsBetween(0, Long.MaxValue)
      val f = g.select(col("user_id"), col("d"), col("v"),
        max(when(col("v").isNotNull, col("d"))).over(wp).as("pd"),
        min(when(col("v").isNotNull, col("d"))).over(wn).as("nd"))
      val po = o.select(col("user_id").as("pu"), col("d").as("pdd"),
        col("v").as("pv"))
      val no = o.select(col("user_id").as("nu"), col("d").as("ndd"),
        col("v").as("nv"))
      val out = f
        .join(po, col("user_id") === col("pu") && col("pd") === col("pdd"))
        .join(no, col("user_id") === col("nu") && col("nd") === col("ndd"))
        .select(col("d"), col("v"),
          when(col("nd") === col("pd"), col("pv"))
            .otherwise(((col("nd") - col("d")) * col("pv") +
              (col("d") - col("pd")) * col("nv")) / (col("nd") - col("pd")))
            .as("est"),
          least(col("pv"), col("nv")).as("lo"),
          greatest(col("pv"), col("nv")).as("hi"))
        .collect()
      out.foreach { row =>
        val (v, est) = (Option(row.get(1)).map(_.toString.toDouble),
          row.getDouble(2))
        v.foreach(x => assert(math.abs(est - x) < 1e-12,
          s"observed day must be exact: $x vs $est"))
        assert(est >= row.getDouble(3) - 1e-12 && est <= row.getDouble(4) + 1e-12,
          s"lerp left the bracket: $row")
      }
    }
  }

  test("MM VAD law: decoded burst activity matches the (seed + block) % 3 gate") {
    val mm = graft.multimodal.Multimodal
    draws(Gen.choose(0L, 100000L), 6).foreach { seed =>
      val nb = 8
      val bytes = mm.synthWavBursts(seed, nb)
      val samples = mm.wavSamples(bytes, 32 * nb).get
      (0 until nb).foreach { j =>
        val energy = samples.slice(j * 32, j * 32 + 32).map(math.abs).sum
        val voiced = energy > 128000d
        assert(voiced == ((seed + j) % 3 != 0),
          s"seed=$seed block=$j energy=$energy")
      }
    }
  }

  test("G8 HITS law: distributed scores match a driver-side recompute") {
    import spark.implicits._
    val out = SparkEntry.queries("g8_hits")(spark, sf)
      .select("doc_id", "authority", "hub").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val n = out.size
    val edges = out.keys.toSeq.flatMap(d =>
      (0 until 4).map(k => d -> ((d * 31 + k * 17 + 7) % n)))
    val a1 = edges.groupBy(_._2).map { case (v, es) => v -> es.size.toLong }
    val h1 = edges.groupBy(_._1).map { case (u, es) =>
      u -> es.map(e => a1.getOrElse(e._2, 0L)).sum }
    val a2 = edges.groupBy(_._2).map { case (v, es) =>
      v -> es.map(e => h1.getOrElse(e._1, 0L)).sum }
    val h2 = edges.groupBy(_._1).map { case (u, es) =>
      u -> es.map(e => a2.getOrElse(e._2, 0L)).sum }
    out.foreach { case (d, (a, h)) =>
      assert(a == a2.getOrElse(d, 0L) && h == h2.getOrElse(d, 0L),
        s"doc $d: got ($a,$h) want (${a2.getOrElse(d, 0L)},${h2.getOrElse(d, 0L)})")
    }
  }

  test("W18 rolling-moments law: windowed skew/kurtosis match a driver fold") {
    import spark.implicits._
    val got = SparkEntry.queries("w18_rolling_moments")(spark, sf)
      .select("event_type", "day", "skew7", "kurt7")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (Option(r.get(2)).map(_.toString.toDouble),
          Option(r.get(3)).map(_.toString.toDouble))).toMap
    val daily = graft.sources.Tables(spark, sf).events
      .groupBy(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("d"))
      .agg(count(lit(1)).as("y"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (t, rs) => t -> rs.sortBy(_._2).map(r => (r._2, r._3)) }
    assert(got.nonEmpty)
    daily.foreach { case (typ, series) =>
      series.sliding(7).foreach { w7 =>
        if (w7.length == 7) {
          val ys = w7.map(_._2.toDouble)
          val mu = ys.sum / 7
          val m2 = ys.map(y => math.pow(y - mu, 2)).sum / 7
          val m3 = ys.map(y => math.pow(y - mu, 3)).sum / 7
          val m4 = ys.map(y => math.pow(y - mu, 4)).sum / 7
          val (gs, gk) = got((typ, w7.last._1))
          if (m2 > 0) {
            assert(math.abs(gs.get - m3 / math.pow(m2, 1.5)) < 2e-4,
              s"skew $typ day=${w7.last._1}")
            assert(math.abs(gk.get - m4 / (m2 * m2)) < 2e-4,
              s"kurt $typ day=${w7.last._1}")
          } else assert(gs.isEmpty && gk.isEmpty)
        }
      }
    }
  }

  test("A14 chi2 law: identity form equals the direct (o-e)^2/e sum") {
    import spark.implicits._
    val row = SparkEntry.queries("a14_chi2_independence")(spark, sf).collect().head
    val chi2 = row.getAs[Any]("chi2").toString.toDouble
    val cells = graft.sources.Tables(spark, sf).documents
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
      .as[(String, String, Long)].collect()
    val n = cells.map(_._3).sum.toDouble
    val r = cells.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val c = cells.groupBy(_._2).map { case (k, v) => k -> v.map(_._3).sum }
    // direct definition over the FULL R x C grid including empty cells
    val direct = (for { (lk, rv) <- r; (ck, cv) <- c } yield {
      val o = cells.find(x => x._1 == lk && x._2 == ck).map(_._3).getOrElse(0L)
      val e = rv * cv / n
      (o - e) * (o - e) / e
    }).sum
    assert(math.abs(chi2 - direct) < 1e-3, s"chi2 $chi2 vs direct $direct")
    assert(row.getAs[Long]("dof_rows") == r.size - 1)
    assert(row.getAs[Long]("dof_cols") == c.size - 1)
  }

  test("G9 assortativity law: distributed r matches a driver-side recompute") {
    val row = SparkEntry.queries("g9_assortativity")(spark, sf).collect().head
    val got = row.getAs[Any]("assortativity").toString.toDouble
    val n = graft.sources.Tables(spark, sf).documents.count()
    val edges = (0L until n).flatMap(d => (0 until (1 + d % 7).toInt).map(k =>
        d -> ((d * 31 + k * 17 + 7) % n)))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map { case (v, vs) => v -> vs.size.toLong }
    val pairs = edges.flatMap(e =>
      Seq((deg(e._1), deg(e._2)), (deg(e._2), deg(e._1))))
    val m = pairs.size.toLong
    val sx = pairs.map(_._1).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val want = (m * sxy - sx * sx).toDouble / (m * sxx - sx * sx)
    assert(row.getAs[Long]("n_endpoints") == m)
    assert(math.abs(got - want) < 1e-6, s"r $got vs $want")
  }

  test("S20 Chao1 law: sample stats match a driver recount; estimator bounds hold") {
    import spark.implicits._
    val row = SparkEntry.queries("s20_ndv_estimate")(spark, sf).collect().head
    val counts = graft.sources.Tables(spark, sf).lineitem
      .filter(col("l_orderkey") % 100 === 0)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().map(_._2)
    val (d, f1, f2) = (counts.length.toLong, counts.count(_ == 1).toLong,
      counts.count(_ == 2).toLong)
    assert(row.getAs[Long]("d_sample") == d)
    assert(row.getAs[Long]("f1") == f1 && row.getAs[Long]("f2") == f2)
    assert(row.getAs[Long]("sample_rows") == counts.sum)
    if (f2 > 0) {
      val est = row.getAs[Any]("ndv_chao1").toString.toDouble
      // Chao1 only ever corrects UPWARD from the observed richness
      assert(est >= d, s"Chao1 $est below observed $d")
      assert(math.abs(est - (d + f1 * f1 / (2.0 * f2))) < 0.01)
    }
  }

  test("D3 BM25F law: top-20 scores match a full driver-side recompute") {
    import spark.implicits._
    val got = SparkEntry.queries("d3_bm25f")(spark, sf)
      .as[(Long, Double)].collect()
    val docs = graft.sources.Tables(spark, sf).documents
      .select("doc_id", "text").as[(Long, String)].collect()
    def tok(s: String): Seq[String] =
      s.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val wp: Map[Long, Map[String, Long]] = docs.map { case (id, text) =>
      val ts = tok(text)
      val (title, body) = ts.splitAt(5)
      val w = (title.map(_ -> 2L) ++ body.map(_ -> 1L))
        .groupBy(_._1).map { case (t, ws) => t -> ws.map(_._2).sum }
      id -> w
    }.toMap
    val df = wp.values.flatMap(_.keys).groupBy(identity)
      .map { case (t, ts) => t -> ts.size.toLong }
    val dlen = wp.map { case (id, w) => id -> w.values.sum }
    val avgdl = dlen.values.sum.toDouble / dlen.size
    val nD = docs.length.toDouble
    val scores = wp.flatMap { case (id, w) =>
      val s = Seq("spark", "window", "shuffle").flatMap(t => w.get(t).map { wtf =>
        math.log((nD - df(t) + 0.5) / (df(t) + 0.5) + 1.0) * (wtf * 2.2) /
          (wtf + 1.2 * (1 - 0.75 + 0.75 * dlen(id) / avgdl))
      })
      if (s.isEmpty) None else Some(id -> s.sum)
    }
    val want = scores.toSeq
      .map { case (id, s) => id -> math.rint(s * 1e4) / 1e4 }
      .sortBy { case (id, s) => (-s, id) }.take(20)
    got.zip(want).foreach { case ((gi, gs), (wi, ws)) =>
      assert(gi == wi, s"rank order: got doc $gi want $wi")
      assert(math.abs(gs - ws) < 1e-3, s"doc $gi score $gs vs $ws")
    }
  }

  test("A15 Theil law: within + between decomposition reassembles the total") {
    import spark.implicits._
    val rows = SparkEntry.queries("a15_theil_decomposition")(spark, sf)
      .select("source", "share_chars", "theil_within", "between_term")
      .collect().map(r => (r.getString(0),
        r.getAs[Any](1).toString.toDouble, r.getAs[Any](2).toString.toDouble,
        r.getAs[Any](3).toString.toDouble))
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4, "shares must sum to 1")
    val decomposed = rows.map(r => r._2 * r._3).sum + rows.map(_._4).sum
    // driver-side total Theil from the raw lengths
    val xs = graft.sources.Tables(spark, sf).documents
      .filter(col("n_chars") > 0).select("n_chars").as[Long].collect()
    val mu = xs.sum.toDouble / xs.length
    val total = xs.map(x => (x / mu) * math.log(x / mu)).sum / xs.length
    assert(math.abs(decomposed - total) < 1e-4,
      s"decomposition $decomposed vs total $total")
    rows.foreach(r => assert(r._3 >= -1e-9, s"within-Theil negative: $r"))
  }

  test("T36 retention-fit law: slope and half-life match a driver regression") {
    val rows = SparkEntry.queries("t36_retention_fit")(spark, sf).collect()
    assert(rows.nonEmpty)
    // rebuild the retention points from the t14 matrix and refit
    val cells = SparkEntry.queries("t14_cohort_retention")(spark, sf)
      .select("cohort_week", "week_offset", "n_active", "cohort_size")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { r =>
      val cw = r.getLong(0)
      val slope = r.getAs[Any]("slope").toString.toDouble
      val pts = cells.filter(c => c._1 == cw && c._2 >= 0 && c._2 <= 3 && c._3 > 0)
        .map(c => (c._2.toDouble,
          math.rint(math.log(c._3.toDouble / c._4) * 1e12) / 1e12))
      assert(pts.length == 4, s"cohort $cw must have 4 points to be fitted")
      val sy = pts.map(_._2).sum
      val sky = pts.map(p => p._1 * p._2).sum
      val want = (2 * sky - 3 * sy) / 10
      assert(math.abs(slope - want) < 1e-5, s"cohort $cw slope $slope vs $want")
      if (want < 0) {
        val hl = r.getAs[Any]("half_life_weeks").toString.toDouble
        assert(math.abs(hl - 0.6931471805599453 / -want) < 1e-2,
          s"cohort $cw half-life $hl")
      }
    }
  }

  test("T37 STL-anomaly laws: per-dow residuals close to zero-sum; flag equals |z|>2") {
    val rows = SparkEntry.queries("t37_stl_anomaly")(spark, sf)
      .collect().map(r => (r.getLong(2),
        Option(r.get(3)).map(_.toString.toDouble), r.getInt(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, z, flagged) =>
      z.foreach { zv =>
        // the exact-integer flag must agree with the rounded z everywhere
        // except within rounding distance of the threshold itself
        if (math.abs(math.abs(zv) - 2.0) > 1e-3)
          assert((flagged == 1) == (math.abs(zv) > 2.0), s"flag vs z=$zv")
      }
    }
    // zero-sum: z-scores within a dow group sum to ~0 (scaled residuals
    // are deviations from the per-dow mean by construction)
    rows.groupBy(_._1).foreach { case (dow, rs) =>
      val zs = rs.flatMap(_._2)
      if (zs.nonEmpty)
        assert(math.abs(zs.sum) < 1e-2 * zs.length, s"dow $dow z-sum ${zs.sum}")
    }
  }

  test("W19 Bollinger laws: bands bracket the mean; %B agrees with the breach flags") {
    val rows = SparkEntry.queries("w19_bollinger")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ma = r.getAs[Any]("ma7").toString.toDouble
      val up = Option(r.get(4)).map(_.toString.toDouble)
      val lo = Option(r.get(5)).map(_.toString.toDouble)
      val pb = Option(r.get(6)).map(_.toString.toDouble)
      val (bu, bd) = (r.getAs[Int]("breach_up"), r.getAs[Int]("breach_down"))
      for (u <- up; l <- lo) {
        assert(l <= ma + 1e-9 && ma <= u + 1e-9, s"band order: $l $ma $u")
        // %B > 1 above the upper band, < 0 below the lower band
        pb.foreach { p =>
          if (math.abs(p - 1.0) > 1e-3 && math.abs(p) > 1e-3) {
            assert((bu == 1) == (p > 1.0), s"breach_up vs pct_b=$p")
            assert((bd == 1) == (p < 0.0), s"breach_down vs pct_b=$p")
          }
        }
      }
      assert(bu + bd <= 1, "cannot breach both bands")
    }
  }

  test("D7ld l-diversity laws: l never exceeds k; histogram conserves the corpus") {
    import spark.implicits._
    val rows = SparkEntry.queries("d7_l_diversity")(spark, sf)
      .select("l", "n_groups", "n_rows").as[(Long, Long, Long)].collect()
    val total = graft.sources.Tables(spark, sf).documents.count()
    assert(rows.map(_._3).sum == total, "row histogram must conserve the corpus")
    // driver recount of the quasi-identifier groups
    val groups = graft.sources.Tables(spark, sf).documents
      .select(col("source"), expr("n_chars DIV 500").as("b"), col("lang"))
      .as[(String, Long, String)].collect()
      .groupBy(g => (g._1, g._2)).values
      .map(g => (g.length.toLong, g.map(_._3).distinct.length.toLong))
    groups.foreach { case (k, l) => assert(l <= k, s"l=$l exceeds k=$k") }
    val want = groups.groupBy(_._2).map { case (l, gs) =>
      (l, gs.size.toLong, gs.map(_._1).sum) }.toSet
    assert(rows.toSet == want, s"histogram ${rows.toSet} vs $want")
  }

  test("A16 HHI laws: bounds vs top share and effective-count inversion") {
    val r = SparkEntry.queries("a16_hhi")(spark, sf).collect().head
    val ns = r.getAs[Long]("n_sources")
    val hhi = r.getAs[Any]("hhi").toString.toDouble
    val eff = r.getAs[Any]("effective_sources").toString.toDouble
    val top = r.getAs[Any]("top_share").toString.toDouble
    assert(hhi >= 1.0 / ns - 1e-6 && hhi <= 1.0 + 1e-9, s"HHI out of range: $hhi")
    assert(top * top <= hhi + 1e-6 && hhi <= top + 1e-6,
      s"HHI $hhi must sit between top² and top ($top)")
    assert(math.abs(hhi * eff - 1.0) < 1e-3, s"1/HHI inversion: $hhi * $eff")
    assert(eff <= ns + 1e-9, "effective sources cannot exceed actual sources")
  }

  test("G10 local-clustering laws: corner counts triple the g2 global total; lcc in [0,1]") {
    val rows = SparkEntry.queries("g10_local_clustering")(spark, sf).collect()
    val globalTri = SparkEntry.queries("g2_triangles")(spark, sf)
      .collect().head.getAs[Long]("n_triangles")
    // every triangle has exactly three corners
    assert(rows.map(_.getAs[Long]("n_triangles")).sum == 3 * globalTri,
      "per-vertex triangle corners must sum to 3x the global count")
    rows.foreach { r =>
      Option(r.get(3)).map(_.toString.toDouble).foreach(l =>
        assert(l >= 0.0 && l <= 1.0 + 1e-9, s"lcc out of range: $r"))
      if (r.getAs[Long]("degree") < 2) assert(r.get(3) == null)
    }
  }

  test("A17 Mann-Whitney law: doubled U matches a driver-side tie-averaged ranking") {
    import spark.implicits._
    val r = SparkEntry.queries("a17_mann_whitney")(spark, sf).collect().head
    val vals = graft.sources.Tables(spark, sf).events
      .filter(col("event_type").isin("click", "purchase") && col("value").isNotNull)
      .select("event_type", "value").as[(String, Double)].collect()
    val sorted = vals.map(_._2).sorted
    // tie-averaged rank of v: (count(< v) + 1 + count(<= v)) / 2, doubled
    def rank2(v: Double): Long = {
      val lt = sorted.count(_ < v).toLong
      val le = sorted.count(_ <= v).toLong
      lt + 1 + le
    }
    val r2a = vals.filter(_._1 == "click").map(p => rank2(p._2)).sum
    val n1 = vals.count(_._1 == "click").toLong
    val n2 = vals.count(_._1 == "purchase").toLong
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    assert(r.getAs[Long]("u_times_2") == r2a - n1 * (n1 + 1),
      s"2U mismatch: ${r.getAs[Long]("u_times_2")} vs ${r2a - n1 * (n1 + 1)}")
    // 2U is bounded by [0, 2*n1*n2]
    val u2 = r.getAs[Long]("u_times_2")
    assert(u2 >= 0 && u2 <= 2 * n1 * n2)
  }

  test("A18 bootstrap law: CI matches a full driver-side replicate recompute") {
    import spark.implicits._
    val r = SparkEntry.queries("a18_poisson_bootstrap")(spark, sf).collect().head
    val vals = graft.sources.Tables(spark, sf).events
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("event_id"), col("value").cast("decimal(18,2)"))
      .as[(Long, java.math.BigDecimal)].collect()
    def md5mod16(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 16
    }
    def weight(h: Long): Long =
      if (h < 6) 0L else if (h < 11) 1L else if (h < 15) 2L else 3L
    val means = (0 until 50).flatMap { b =>
      var sx = java.math.BigDecimal.ZERO
      var sw = 0L
      vals.foreach { case (id, x) =>
        val w = weight(md5mod16(s"$id:$b"))
        sx = sx.add(x.multiply(java.math.BigDecimal.valueOf(w)))
        sw += w
      }
      if (sw > 0) Some((b, sx.doubleValue() / sw)) else None
    }.sortBy { case (b, m) => (m, b) }
    val wantLo = math.rint(means(2)._2 * 1e4) / 1e4
    val wantHi = math.rint(means(47)._2 * 1e4) / 1e4
    assert(r.getAs[Long]("n_resamples") == means.length)
    val (lo, hi) = (r.getAs[Any]("ci_lo").toString.toDouble,
      r.getAs[Any]("ci_hi").toString.toDouble)
    assert(math.abs(lo - wantLo) < 1e-9 && math.abs(hi - wantHi) < 1e-9,
      s"CI [$lo, $hi] vs driver [$wantLo, $wantHi]")
    // the interval must contain the full-sample mean
    val mean = r.getAs[Any]("mean_full").toString.toDouble
    assert(lo <= mean && mean <= hi, s"CI [$lo, $hi] excludes mean $mean")
  }

  test("T38 DiD law: estimate equals the four driver-side cell means") {
    import spark.implicits._
    val r = SparkEntry.queries("t38_did")(spark, sf).collect().head
    val daily = graft.sources.Tables(spark, sf).events
      .filter(col("event_type").isin("click", "view"))
      .groupBy(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("d"))
      .agg(count(lit(1)).as("y")).as[(String, Long, Long)].collect()
    val (d0, d1) = (daily.map(_._2).min, daily.map(_._2).max)
    val mid = d0 + (d1 - d0 + 1) / 2
    def m(typ: String, post: Boolean): Double = {
      val cell = daily.filter(e => e._1 == typ && ((e._2 >= mid) == post))
      cell.map(_._3).sum.toDouble / cell.length
    }
    val want = (m("click", post = true) - m("click", post = false)) -
      (m("view", post = true) - m("view", post = false))
    val did = r.getAs[Any]("did").toString.toDouble
    assert(math.abs(did - want) < 1e-3, s"DiD $did vs driver $want")
    assert(r.getAs[Long]("nd_pre") ==
      daily.filter(e => e._1 == "click" && e._2 < mid).length)
  }
}
