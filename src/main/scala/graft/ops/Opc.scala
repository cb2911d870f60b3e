package graft.ops

/** Shared OPC (Open Packaging Conventions) plumbing for the office
  * extractors ([[Docx]]/[[Pptx]]/[[Xlsx]]): the `.rels` relationship
  * parts that define the AUTHORED part order. ADVICE r12:
  * deriving slide/sheet order from numeric part names (`slideN.xml`)
  * extracts renumbered or reordered real-world decks in the wrong
  * order — OOXML's source of truth is `presentation.xml`'s
  * `<p:sldIdLst>` (resp. `workbook.xml`'s `<sheets>`) whose `r:id`
  * attributes resolve through the rels part to the actual targets.
  *
  * JDK-only StAX, DTD/XXE disabled, same as every office walker here.
  */
object Opc {

  private[ops] def newReader(xml: Array[Byte]): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(
      javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new java.io.ByteArrayInputStream(xml))
  }

  /** One relationship: its /rels `Type` URI and the `Target` part. */
  final case class Rel(relType: String, target: String)

  /** Parse a `.rels` part: Id → (Type, Target), duplicate Ids refuse
    * (a silently-shadowed relationship would reorder the document).
    */
  def parseRels(xml: Array[Byte]): Map[String, Rel] = {
    val r = newReader(xml)
    val m = scala.collection.mutable.LinkedHashMap[String, Rel]()
    try {
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == "Relationship") {
          val id = r.getAttributeValue(null, "Id")
          val ty = r.getAttributeValue(null, "Type")
          val tg = r.getAttributeValue(null, "Target")
          if (id == null || ty == null || tg == null)
            throw new IllegalArgumentException("relationship missing Id/Type/Target")
          if (m.contains(id))
            throw new IllegalArgumentException(s"duplicate relationship id $id")
          m(id) = Rel(ty, tg)
        }
      }
    } finally r.close()
    m.toMap
  }

  /** The `r:id` attribute values of every `<child>` element inside the
    * document part, in DOCUMENT order — the authored slide/sheet order.
    * The attribute is matched by LOCAL name `id` in the relationships
    * namespace (any prefix).
    */
  def orderedRefIds(xml: Array[Byte], child: String): Vector[String] = {
    val r = newReader(xml)
    val out = Vector.newBuilder[String]
    try {
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
          r.getLocalName == child) {
          var found: String = null
          var i = 0
          while (i < r.getAttributeCount) {
            val ns = r.getAttributeNamespace(i)
            if (r.getAttributeLocalName(i) == "id" && ns != null &&
              ns.endsWith("/relationships")) found = r.getAttributeValue(i)
            i += 1
          }
          if (found == null)
            throw new IllegalArgumentException(s"<$child> without an r:id")
          out += found
        }
      }
    } finally r.close()
    out.result()
  }

  /** Resolve a rels `Target` against the source part's base directory
    * (`ppt/` for presentation.xml, `xl/` for workbook.xml): absolute
    * (`/ppt/slides/...`) strips the slash, relative prepends the base,
    * and a leading `./` is dropped.
    */
  def resolveTarget(base: String, target: String): String =
    if (target.startsWith("/")) target.substring(1)
    else if (target.startsWith("./")) base + target.substring(2)
    else base + target

  /** The ordered part names the document part's `<child>` list refers
    * to: r:ids in document order, each resolved through the rels map,
    * filtered to `relType` (a suffix like "/slide" — rels Type URIs end
    * with the kind). A referenced id missing from the rels, or of the
    * wrong type, refuses — a dropped slide would silently truncate the
    * corpus text.
    */
  def orderedTargets(docXml: Array[Byte], relsXml: Array[Byte],
                     child: String, relTypeSuffix: String,
                     base: String): Vector[String] = {
    val rels = parseRels(relsXml)
    orderedRefIds(docXml, child).map { id =>
      val rel = rels.getOrElse(id,
        throw new IllegalArgumentException(s"r:id $id has no relationship"))
      if (!rel.relType.endsWith(relTypeSuffix))
        throw new IllegalArgumentException(
          s"r:id $id resolves to ${rel.relType}, wanted *$relTypeSuffix")
      resolveTarget(base, rel.target)
    }
  }
}
