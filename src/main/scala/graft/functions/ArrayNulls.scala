package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Shared null-element scan for the long-array kernels: their
  * ArrayData getters silently read a null slot as 0, so exprs whose
  * input type is containsNull=true guard with this and poison to
  * NULL (the containsNull=false fast path skips the scan entirely).
  */
object ArrayNulls {
  def hasNull(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }
}
