package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Test-tree bridge to the package-private native hash kernels, so specs
  * outside `graft.functions` (ClassifierSpec's in-JVM model) can recompute
  * expected values from the same primitive the engine uses. */
object TestHashAccess {
  def tokenHashes(s: String): Array[Long] =
    HashExpressions.tokenHashes(UTF8String.fromString(s))
}
