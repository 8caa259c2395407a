package graft.operators

import org.apache.spark.sql.SparkSession

/** Identity sidecar for a published IVF-PQ codes snapshot.
  *
  * The codes parquet under `<dir>/codes` is meaningless without the
  * training/encode knobs that produced it: reading codes with a
  * mismatched subquantizer count `m` ADC-scores garbage (the per-code
  * byte layout changes), a mismatched `flavor` scores raw vectors with
  * residual codebooks (or vice versa), and a mismatched cell count
  * routes queries to cells the codes were never assigned to. Until
  * round 19 those invariants were enforced only by a directory NAMING
  * convention (`ivfpq_<flavor>_c<cells>[_m<m>][_r<routeWidth>]`) — this
  * sidecar makes them explicit: the encode writer persists
  * `params.json` beside `codes/`, and every reader validates before
  * serving. Legacy snapshots (published before the sidecar existed)
  * carry no params.json and are accepted as-is — the naming convention
  * remains their only identity — but a PRESENT sidecar that disagrees
  * with what the reader expects is a hard error, never a silent
  * garbage-scoring serve.
  *
  * Reference counterpart: none — the reference (dehnsw.h) has no IVF-PQ
  * tier; this is the engine's own artifact-identity discipline, the
  * same contract class as the vector snapshot's params.json
  * ([[graft.index.VectorIndex.save]]).
  *
  * @param flavor     codebook flavor: "global" (PQ over raw vectors) or
  *                   "residual" (PQ over x - centroid(cell(x)), the
  *                   FAISS IVFPQ shape)
  * @param numCents   coarse-quantizer cell count the codes were
  *                   assigned against
  * @param m          PQ subquantizer count (code bytes per vector)
  * @param codewords  codewords per subquantizer (ADC table width)
  * @param route      encode-side cell-assignment router: "argmin" or
  *                   "beam<W>" ([[IvfKnn.routedAssign]])
  * @param corpus     identity of the corpus the codes were encoded FROM
  *                   — for generated benchmark corpora the generator
  *                   knobs JSON (ClusteredBench's corpus.json string),
  *                   for real corpora a content fingerprint WRAPPED AS
  *                   AN OBJECT ({"fingerprint":"..."} — writeParams
  *                   refuses a bare string, which would not survive the
  *                   sidecar's balanced-brace parse). Codes
  *                   published before a corpus regeneration at the same
  *                   dir must not silently serve against the new one —
  *                   the same failure class the graph snapshot's
  *                   corpus.json gate closes. Empty = unrecorded
  *                   (legacy), accepted as-is.
  */
case class IvfPqParams(flavor: String, numCents: Int, m: Int,
    codewords: Int, route: String, corpus: String = "")

object IvfPqSnapshot {

  /** Persist the identity sidecar beside a just-published codes dir. */
  def writeParams(spark: SparkSession, dir: String, p: IvfPqParams): Unit = {
    val json =
      s"""{"flavor":"${p.flavor}","num_cents":${p.numCents},"m":${p.m},""" +
        s""""codewords":${p.codewords},"route":"${p.route}"""" +
        // raw object, not a string: the corpus identity is itself JSON
        (if (p.corpus.isEmpty) "}" else s""","corpus":${p.corpus}}""")
    // the identity must survive the reader's balanced-brace slice: a
    // non-object value (a bare fingerprint string) would write invalid
    // JSON that readParams slices to "" — the corpus gate the field
    // exists for would then be SILENTLY off for every reader. Refuse at
    // write time with guidance instead (wrap fingerprints in an object)
    require(p.corpus.isEmpty ||
        graft.index.VectorIndex.sliceBalanced(json, "corpus", '{', '}')
          .contains(p.corpus),
      s"IvfPqSnapshot: corpus identity must be a JSON OBJECT that " +
        s"round-trips the sidecar (got: ${p.corpus}) — wrap a raw " +
        """fingerprint as {"fingerprint":"..."}""")
    graft.index.VectorIndex.writeSmallFile(spark, s"$dir/params.json", json)
  }

  /** Read a snapshot's identity sidecar; None for legacy snapshots
    * published before the sidecar existed (callers fall back to the
    * naming convention). A present-but-unparseable sidecar is a hard
    * error — unlike the calibration sidecar (an optimization hint whose
    * absence degrades safely), identity corruption must not degrade
    * into a silently-wrong serve. */
  def readParams(spark: SparkSession, dir: String): Option[IvfPqParams] = {
    val json = graft.index.VectorIndex.readSmallFile(spark, s"$dir/params.json")
    if (json == null) return None
    def str(k: String) =
      (s""""$k":\\s*"([^"]*)"""").r.findFirstMatchIn(json).getOrElse(
        sys.error(s"IvfPqSnapshot: $dir/params.json is corrupt " +
          s"(missing \"$k\"): $json")).group(1)
    def num(k: String) =
      (s""""$k":\\s*(\\d+)""").r.findFirstMatchIn(json).getOrElse(
        sys.error(s"IvfPqSnapshot: $dir/params.json is corrupt " +
          s"(missing \"$k\"): $json")).group(1).toInt
    Some(IvfPqParams(str("flavor"), num("num_cents"), num("m"),
      num("codewords"), str("route"),
      graft.index.VectorIndex.sliceBalanced(json, "corpus", '{', '}')
        .getOrElse("")))
  }

  /** Validate a snapshot against the knobs a reader is about to serve
    * with. Legacy snapshots (no sidecar) pass — the route is an
    * encode-provenance note, not a serve knob, so it is recorded but
    * not matched. Throws on any mismatch of flavor / cells / m /
    * codewords: every one of those silently corrupts ADC scoring.
    * `corpus` (when the caller passes one AND the sidecar recorded one)
    * must match too — codes encoded from a differently-generated corpus
    * ADC-score the WRONG vectors even with identical knobs. */
  def requireCompatible(spark: SparkSession, dir: String, flavor: String,
      numCents: Int, m: Int, codewords: Int, corpus: String = ""): Unit =
    readParams(spark, dir).foreach { found =>
      val expect = (flavor, numCents, m, codewords)
      val got = (found.flavor, found.numCents, found.m, found.codewords)
      require(got == expect,
        s"IvfPqSnapshot: $dir holds codes for (flavor, cells, m, " +
          s"codewords) = $got but the reader expects $expect — serving " +
          "would ADC-score garbage; point at the matching snapshot")
      require(corpus.isEmpty || found.corpus.isEmpty ||
          corpus == found.corpus,
        s"IvfPqSnapshot: $dir was encoded from corpus ${found.corpus} " +
          s"but the reader serves corpus $corpus — the codes describe " +
          "different vectors; re-encode or point at the matching snapshot")
    }
}
