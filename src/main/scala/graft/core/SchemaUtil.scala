package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Schema normalization + compatibility validation, Spark-typed equivalent of
  * kartothek/core/common_metadata.py:
  *  - normalize_type (286-331): signed ints → int64, floats → float64,
  *    recursively inside one-level lists; dictionary → value type.
  *  - normalize column order (151-219): partition keys first, then payload
  *    alphabetically.
  *  - validate_compatible (421-670): strict schema equality with the special
  *    rule that an all-null (NullType) column is compatible with any type.
  *
  * uint64 has no Spark type; we map unsigned to LongType with a documented
  * wraparound caveat (SURVEY §7.5).
  */
object SchemaUtil {

  /** Normalize one Spark DataType per normalize_type. */
  def normalizeType(dt: DataType): DataType = dt match {
    case ByteType | ShortType | IntegerType | LongType => LongType
    case FloatType | DoubleType                        => DoubleType
    case ArrayType(elem, containsNull)                 => ArrayType(normalizeType(elem), containsNull)
    case other                                         => other
  }

  def normalizeSchema(schema: StructType, partitionKeys: Seq[String] = Nil): StructType = {
    val normalized = schema.fields.map(f => f.copy(dataType = normalizeType(f.dataType)))
    StructType(orderFields(normalized, partitionKeys))
  }

  /** Partition keys first (in declared order), payload alphabetically
    * (common_metadata.py:151-219).
    */
  private def orderFields(fields: Array[StructField], partitionKeys: Seq[String]): Array[StructField] = {
    val byName = fields.map(f => f.name -> f).toMap
    val keys = partitionKeys.flatMap(byName.get)
    val payload = fields.filterNot(f => partitionKeys.contains(f.name)).sortBy(_.name)
    (keys ++ payload).toArray
  }

  /** Cast a DataFrame to its normalized schema + column order. A pure
    * projection — stays inside whole-stage codegen.
    */
  def normalize(df: DataFrame, partitionKeys: Seq[String] = Nil): DataFrame = {
    val target = normalizeSchema(df.schema, partitionKeys)
    df.select(target.fields.map { f =>
      val src = df.schema(f.name)
      if (src.dataType == f.dataType) col(s"`${f.name}`")
      else col(s"`${f.name}`").cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }

  /** Strict compatibility check ≙ validate_compatible/validate_shared_columns
    * (common_metadata.py:421-742). NullType on either side of a column is
    * compatible with anything (all-null column rule, 474,586-670). Produces a
    * unified-diff-style error like common_metadata.py:556-583.
    */
  def validateCompatible(reference: StructType, candidate: StructType): Unit = {
    val refMap = reference.fields.map(f => f.name -> f.dataType).toMap
    val candMap = candidate.fields.map(f => f.name -> f.dataType).toMap
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    if (refMap.keySet != candMap.keySet) {
      (refMap.keySet -- candMap.keySet).toSeq.sorted.foreach(c => problems += s"- missing column: $c")
      (candMap.keySet -- refMap.keySet).toSeq.sorted.foreach(c => problems += s"+ extra column: $c")
    }
    for (name <- refMap.keySet intersect candMap.keySet) {
      val (r, c) = (refMap(name), candMap(name))
      if (!typesCompatible(r, c))
        problems += s"! column '$name': reference ${r.simpleString} != candidate ${c.simpleString}"
    }
    if (problems.nonEmpty)
      throw new IllegalArgumentException(
        ("Schema violation — schemas are not compatible:\n" + problems.sorted.mkString("\n")))
  }

  private def typesCompatible(a: DataType, b: DataType): Boolean = (a, b) match {
    case (NullType, _) | (_, NullType) => true
    case (ArrayType(ea, _), ArrayType(eb, _)) => typesCompatible(ea, eb)
    case _ => a == b
  }

  /** Merge a candidate into a reference schema, resolving NullType columns to
    * the concrete type when one side has it (the all-null-column merge).
    */
  def mergeSchemas(reference: StructType, candidate: StructType): StructType = {
    validateCompatible(reference, candidate)
    val candMap = candidate.fields.map(f => f.name -> f).toMap
    StructType(reference.fields.map { f =>
      (f.dataType, candMap.get(f.name).map(_.dataType)) match {
        case (NullType, Some(other)) if other != NullType => f.copy(dataType = other)
        case _ => f
      }
    })
  }

  /** ADDITIVE schema evolution (Delta `mergeSchema` semantics): columns the
    * candidate adds are appended as nullable; columns it lacks stay (its
    * files simply won't carry them — the explicit-schema read fills nulls);
    * a TYPE change on a shared column is still rejected. Returns the
    * evolved dataset schema.
    */
  def evolveSchemas(reference: StructType, candidate: StructType): StructType = {
    val refMap = reference.fields.map(f => f.name -> f.dataType).toMap
    val problems = candidate.fields.toSeq.flatMap { f =>
      refMap.get(f.name) match {
        case Some(r) if !typesCompatible(r, f.dataType) =>
          Some(s"! column '${f.name}': reference ${r.simpleString} != candidate ${f.dataType.simpleString}")
        case _ => None
      }
    }
    if (problems.nonEmpty)
      throw new IllegalArgumentException(
        "Schema violation — evolution cannot change column types:\n" + problems.sorted.mkString("\n"))
    val resolved = StructType(reference.fields.map { f =>
      (f.dataType, refMap.get(f.name), candidate.fields.find(_.name == f.name).map(_.dataType)) match {
        case (NullType, _, Some(other)) if other != NullType => f.copy(dataType = other)
        case _ => f
      }
    })
    val newFields = candidate.fields.filterNot(f => refMap.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(resolved.fields ++ newFields)
  }
}
