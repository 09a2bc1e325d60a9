package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for large-scale text corpora: exact
  * (fingerprint group-by), n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Design for 100 TB:
  *  - exact dedup is one hash-aggregate on a 128-bit digest — shuffle
  *    volume is O(distinct docs), not O(bytes);
  *  - MinHash signatures are integer-arithmetic only (a shared
  *    md5-prefix base hash), so signatures are reproducible across
  *    engines and runs — no RNG state;
  *  - LSH banding turns the quadratic candidate search into an
  *    equi-join on (band, band-signature) — the only pairwise work is
  *    within buckets;
  *  - the exact-Jaccard verify join touches candidate pairs only.
  */
object Dedup {

  /** 31-bit shared base hash of a string: first 12 hex chars of md5
    * (48 bits) mod the Mersenne prime 2^31-1. Deterministic and
    * reproducible in any engine with md5.
    */
  val MersennePrime31: Long = 2147483647L
  def baseHash31(s: Column): Column =
    conv(substring(md5(s), 1, 12), 16, 10).cast("long") % MersennePrime31

  /** Universal-hash family over the 31-bit base hash; seeds derive
    * from the hash index, so the family is stateless.
    */
  def universalHash(h31: Column, j: Column): Column = {
    val a = (lit(1103515245L) * (j + 1)) % MersennePrime31
    val b = (lit(69069L) * (j + 1) + 12345L) % MersennePrime31
    (a * h31 + b) % MersennePrime31
  }

  /** Distinct character k-shingles per document via substring over a
    * position sequence (no UDF). Returns (idCol, shingle).
    */
  def charShingles(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol), col(textCol).as("__txt"))
      .withColumn("__pos", explode(sequence(lit(1), greatest(length(col("__txt")) - (k - 1), lit(1)))))
      .select(col(idCol), expr(s"substring(__txt, __pos, $k)").as("shingle"))
      .distinct()

  /** Exact duplicate groups by content fingerprint: one row per
    * fingerprint with representative (min id) and group size.
    */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_n"))

  /** Pairwise exact n-gram Jaccard over a document set (use only on a
    * bounded subset or within LSH buckets — this is the quadratic
    * verify step, not the scale path). Returns (a_id, b_id, inter,
    * na, nb, jaccard) for pairs sharing ≥1 shingle.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    jaccardFromShingles(charShingles(df, idCol, textCol, k).cache(), idCol)

  /** Jaccard pairs from a precomputed (cached) shingle table — lets a
    * MinHash+verify pipeline share one shingle scan.
    */
  def jaccardFromShingles(sh: DataFrame, idCol: String): DataFrame = {
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = sh.select(col(idCol).as("a_id"), col("shingle"))
    val b = sh.select(col(idCol).as("b_id"), col("shingle"))
    val inter = a
      .join(b, Seq("shingle"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col(idCol).as("a_id"), col("sz").as("na"))), Seq("a_id"))
      .join(broadcast(sizes.select(col(idCol).as("b_id"), col("sz").as("nb"))), Seq("b_id"))
      .withColumn("jaccard", col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
  }

  /** MinHash signatures: (idCol, j, mh) for j in [0, numHashes). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String, k: Int, numHashes: Int): DataFrame =
    minhashFromShingles(charShingles(df, idCol, textCol, k), idCol, numHashes)

  /** MinHash signatures from a precomputed shingle table.
    *
    * Computed as `numHashes` columnar min-aggregates in ONE pass over
    * the shingle rows (map-side combined), then unpivoted — ~30×
    * less shuffle than exploding a hash-index column per row.
    */
  def minhashFromShingles(sh: DataFrame, idCol: String, numHashes: Int): DataFrame = {
    val withH = sh.withColumn("h31", baseHash31(col("shingle")))
    val aggs = (0 until numHashes).map(j => min(universalHash(col("h31"), lit(j))).as(s"mh$j"))
    val wide = withH.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
    val stackExpr = (0 until numHashes).map(j => s"$j, mh$j").mkString(", ")
    wide.select(col(idCol), expr(s"stack($numHashes, $stackExpr) AS (j, mh)"))
  }

  /** Exact Jaccard restricted to a candidate-pair table: each side's
    * distinct shingle set is collected into an array and the pair's
    * intersection is computed with `array_intersect` — shuffle volume
    * is O(candidates × shingles-per-doc), versus the Σ freq² blowup of
    * the full shingle self-join (a ubiquitous 3-gram appearing in
    * every doc contributes |docs|² rows there). This is the verify
    * step of the MinHash+LSH scale path; results are value-identical
    * to [[jaccardFromShingles]] filtered to the candidates.
    */
  def jaccardOnCandidates(cands: DataFrame, sh: DataFrame, idCol: String): DataFrame = {
    val sets = sh.groupBy(col(idCol))
      .agg(collect_list(col("shingle")).as("shset"), count(lit(1)).as("sz"))
    cands
      .join(sets.select(col(idCol).as("a_id"), col("shset").as("a_set"), col("sz").as("na")), Seq("a_id"))
      .join(sets.select(col(idCol).as("b_id"), col("shset").as("b_set"), col("sz").as("nb")), Seq("b_id"))
      .withColumn("inter", size(array_intersect(col("a_set"), col("b_set"))).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
      .drop("a_set", "b_set")
  }

  /** LSH banding of a MinHash signature table: (idCol, band,
    * band_sig) where band_sig digests the band's signature rows.
    */
  def lshBands(sig: DataFrame, idCol: String, rowsPerBand: Int): DataFrame =
    sig
      .withColumn("band", (col("j") / rowsPerBand).cast("int"))
      .groupBy(col(idCol), col("band"))
      .agg(
        md5(
          concat_ws(
            ",",
            transform(array_sort(collect_list(struct(col("j"), col("mh")))), s => s.getField("mh").cast("string"))
          )
        ).as("band_sig")
      )

  /** Candidate near-duplicate pairs: documents sharing any LSH bucket.
    * Equi-join on (band, band_sig) — the scale path.
    */
  def lshCandidates(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col(idCol).as("a_id"), col("band"), col("band_sig"))
    val b = bands.select(col(idCol).as("b_id"), col("band"), col("band_sig"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
  }

  /** Star edges from LSH buckets: one edge (bucket-min-id, member) per
    * bucket member instead of all member pairs. Connectivity — and
    * therefore the connected components — is identical to the pairwise
    * candidate graph, but edge count is Σ|bucket| rather than
    * Σ|bucket|², which is the difference between linear and quadratic
    * shuffle on an exact-dup-heavy corpus. Feed to
    * [[connectedComponents]] for dedup clusters.
    */
  def lshStarEdges(bands: DataFrame, idCol: String): DataFrame = {
    val bucketMin = bands.groupBy(col("band"), col("band_sig")).agg(min(col(idCol)).as("a_id"))
    bands
      .join(bucketMin, Seq("band", "band_sig"))
      .filter(col(idCol) =!= col("a_id"))
      .select(col("a_id"), col(idCol).as("b_id"))
      .distinct()
  }

  /** Connected components over an undirected pair table (near-dup
    * GROUPS from near-dup PAIRS — the step that turns LSH candidate
    * edges into dedup clusters with one representative per cluster).
    *
    * Min-label propagation with POINTER JUMPING: each round a node
    * takes the min label over itself and its neighbors (one hop), then
    * resolves that label through the current mapping (comp ← comp of
    * comp), doubling the propagation distance — O(log diameter)
    * rounds, which matters because mutation-chain duplicates form long
    * paths, not cliques. Each round's result is `localCheckpoint`ed:
    * iterative self-referencing plans otherwise double in size every
    * round and analysis time dwarfs execution (on a cluster, use a
    * checkpoint dir for fault tolerance instead). Convergence is
    * detected by the label sum, which strictly decreases while any
    * label changes — one aggregate action per round, no compare join.
    * Deterministic: the component label is the component's min id.
    *
    * @return (id, component)
    */
  /** @param partitions shuffle width for the iterative rounds. Size to
    *                    the node count (rows are two longs): a small
    *                    graph on the session-default width pays ~32
    *                    scheduler-latency-bound tasks per round for
    *                    nothing. 0 = leave at session default.
    */
  def connectedComponents(
      nodes: DataFrame,
      edges: DataFrame,
      idCol: String,
      maxIters: Int = 25,
      partitions: Int = 0
  ): DataFrame = {
    val symRaw = edges
      .select(col("a_id").as("src"), col("b_id").as("dst"))
      .unionByName(edges.select(col("b_id").as("src"), col("a_id").as("dst")))
    val sym = (if (partitions > 0) symRaw.repartition(partitions, col("dst")) else symRaw).cache()
    val labels0 = nodes.select(col(idCol).as("id"), col(idCol).as("component"))
    var labels = (if (partitions > 0) labels0.repartition(partitions, col("id")) else labels0)
      .localCheckpoint(true)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("component").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var it = 0
    var converged = false
    while (!converged && it < maxIters) {
      val nbrMin = sym
        .join(labels, col("dst") === col("id"))
        .groupBy(col("src"))
        .agg(min(col("component")).as("nbr_min"))
      val hop = labels
        .join(nbrMin, col("id") === col("src"), "left")
        .select(col("id"), least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component"))
      // pointer jump: labels are ids, so resolve through hop itself
      val jumped = hop.as("x")
        .join(hop.select(col("id").as("cid"), col("component").as("cparent")).as("y"),
          col("x.component") === col("cid"), "left")
        .select(col("x.id").as("id"), coalesce(col("cparent"), col("x.component")).as("component"))
        .localCheckpoint(true)
      val s = labelSum(jumped)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels = jumped
      it += 1
    }
    sym.unpersist()
    labels
  }

  /** SimHash (nBits ≤ 32): weighted sign-sum of token-hash bits,
    * packed into a long. Tokens weighted by in-document frequency.
    *
    * Fully columnar: all bit-plane sums are aggregates of one pass
    * over (doc, token, count) rows — no per-bit row explosion, one
    * map-side-combined shuffle keyed by doc.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, nBits: Int): DataFrame = {
    val toks = df
      .select(col(idCol), explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 12), 16, 10).cast("long"))
    val bitSums = (0 until nBits).map { i =>
      val bit = floor(col("h") / pow(lit(2.0), lit(i))).cast("long") % 2
      sum(col("cnt") * (bit * 2 - 1)).as(s"s$i")
    }
    val packed = (0 until nBits)
      .map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    toks
      .groupBy(col(idCol))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol), packed.as("simhash"))
  }
}
