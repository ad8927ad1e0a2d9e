package graft.core.pdf

/** Test-side bridge to `private[pdf]` internals (ObjStm expansion order is
  * a liveness invariant worth pinning directly).
  */
object PdfTestAccess {
  def expandObjStm(pdf: String): String = PdfMini.expandObjStm(pdf)
}
