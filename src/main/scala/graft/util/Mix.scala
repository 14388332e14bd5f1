package graft.util

/** SplitMix64 (Steele, Lea & Flood, OOPSLA 2014) — THE mixing primitive
  * every deterministic generator in this repo derives from: corpus/media
  * synthesis, MinHash permutation constants, LSH hyperplanes, sampled-NB
  * trial coins, the scaling control. One definition so any future fix
  * (or constant change) lands exactly once.
  */
object Mix {

  /** 2^64 / φ — the splitmix64 stream increment. */
  final val Golden = 0x9e3779b97f4a7c15L

  /** The finalizer alone — callers fold their own input/stream state
    * first (seed XORs, struct packing, Golden increments). */
  @inline def fin(x0: Long): Long = {
    var x = x0
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Stateless splitmix64 of a value: Golden increment + finalizer. */
  @inline def mix(x: Long): Long = fin(x + Golden)
}
