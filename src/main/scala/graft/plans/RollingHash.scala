package graft.plans

/** The byte-polynomial rolling-hash base shared by the content-hash
  * expressions. ONE definition: [[CdcChunks]]' chunk hashes and
  * [[WinnowFingerprint]]'s k-gram fingerprints promise cross-operator
  * equality ("equal hashes ⟺ equal content"), which silently breaks if
  * either side's base drifts — so neither declares its own copy. Odd ⟹
  * invertible mod 2^64 (wrapping Long arithmetic loses no state). */
private[plans] object RollingHash {
  val B: Long = 1000003L
}
