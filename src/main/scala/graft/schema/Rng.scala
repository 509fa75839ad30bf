package graft.schema

/** Deterministic, splittable, counter-based pseudo-randomness for the
  * fixture generator. Every draw is a pure function of (seed, stream
  * coordinates), so generated data is identical regardless of Spark
  * partitioning or evaluation order — the property the reference gets
  * from a single-threaded seeded `random.Random(seed)`
  * (reference: src/validation/synthetic_households.py:55,152).
  *
  * Core mix is SplitMix64 (public domain, Steele et al. 2014).
  */
object Rng {
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Hash an arbitrary coordinate tuple into one 64-bit value. */
  def h(seed: Long, parts: Long*): Long = {
    var acc = mix(seed)
    var i = 0
    while (i < parts.length) { acc = mix(acc ^ parts(i)); i += 1 }
    acc
  }

  /** Uniform double in [0, 1). */
  def double(seed: Long, parts: Long*): Double =
    (h(seed, parts: _*) >>> 11) * 1.1102230246251565e-16 // 2^-53

  /** Uniform int in [0, bound). */
  def int(bound: Int, seed: Long, parts: Long*): Int = {
    require(bound > 0)
    ((h(seed, parts: _*) >>> 33) % bound).toInt
  }
}
