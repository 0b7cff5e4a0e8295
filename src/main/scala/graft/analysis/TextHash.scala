package graft.analysis

/** Deterministic 64-bit hashing for text dedup (minhash permutations,
  * simhash bit-vectors, rolling fingerprints). Pure JVM arithmetic —
  * identical on every run and partitioning; never crosses an engine
  * boundary (LSH/simhash outputs are verified against EXACT similarity
  * oracles, not against re-hashed values).
  */
object TextHash {

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** splitmix64 finalizer — cheap independent "permutation" family. */
  @inline def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** MinHash signature: sig(j) = min over shingles of splitmix64(h ^ seed_j). */
  def minhashSignature(shingles: Iterable[String], numHashes: Int): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    shingles.foreach { s =>
      val h0 = fnv1a64(s)
      var j = 0
      while (j < numHashes) {
        val hj = splitmix64(h0 ^ (j * 0x9e3779b97f4a7c15L))
        if (hj < sig(j)) sig(j) = hj
        j += 1
      }
    }
    sig
  }

  /** SimHash over (token, tf) pairs: bit b is set iff the tf-weighted
    * sum of ±1 votes from each token-hash bit b is positive.
    */
  def simhash64(termFreqs: Iterable[(String, Long)]): Long = {
    val acc = new Array[Long](64)
    termFreqs.foreach { case (t, tf) =>
      val h = fnv1a64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += tf else acc(b) -= tf
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Polynomial rolling hash of the full token sequence (order
    * sensitive — a document FINGERPRINT, not a set hash).
    */
  def rollingHash(tokens: Iterable[String]): Long = {
    var h = 0L
    tokens.foreach { t => h = h * 0x100000001b3L + fnv1a64(t) }
    h
  }
}
