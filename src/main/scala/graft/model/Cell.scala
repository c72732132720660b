package graft.model

/**
 * The engine's HBase-style cell record (SURVEY.md §1.4).
 *
 * One sparse, versioned key-value datum: the six components the reference
 * copies verbatim through its `CellBuilder` chain (`CopyRow.java:128-136`).
 * `rowKey`/`qualifier`/`value` stay `Array[Byte]` end-to-end — Spark's
 * `BinaryType` comparisons are unsigned-lexicographic, which matches HBase
 * `Bytes.compareTo` row ordering exactly, so sorts and range predicates on
 * row keys keep HBase scan semantics with zero custom code.
 *
 * `ts` is epoch **millis** as `Long`, not `TimestampType` — HBase version
 * semantics, no timezone involvement.
 */
final case class Cell(
    rowKey: Array[Byte],
    family: String,
    qualifier: Array[Byte],
    ts: Long,
    cellType: String,
    value: Array[Byte])
