package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, Literal => VLiteral, NamedReference, Transform}
import org.apache.spark.sql.types._

/** Table PARTITIONING for graftlake: `PARTITIONED BY (col)` (identity)
  * and `PARTITIONED BY (bucket(n, col))`.
  *
  * Iceberg-style: partition columns stay ordinary table columns (data
  * files store them too), and each data file's log entry records the
  * file's PARTITION TUPLE — writers split their input so one file
  * holds exactly one tuple. Pruning then decides partition predicates
  * EXACTLY from the tuple (identity equality/IN/IS NULL on any column
  * type including strings, bucket equality via the bucket function),
  * ahead of the min/max stats which only cover integral columns.
  *
  * The spec is persisted in the table properties
  * (`partition=id:seg,b8:id`) per version, like `colids` — evolution
  * of the partition spec would version the same way (not implemented;
  * the spec is fixed at create).
  */
object LakePartitioning {

  sealed trait Field {
    def col: String
    /** The file-tuple component for a row value (None = null). */
    def eval(v: Any): Option[String]
  }

  /** identity(col): tuple component = the value itself, stringified. */
  case class Identity(col: String) extends Field {
    override def eval(v: Any): Option[String] =
      Option(v).map(_.toString)
  }

  /** bucket(n, col): tuple component = floorMod(long value | hashCode, n).
    * The function is part of the FORMAT contract (pruning re-evaluates
    * it against literals), so keep it dead simple and documented.
    */
  case class Bucket(col: String, n: Int) extends Field {
    def bucketOf(v: Any): Int = v match {
      case l: Long => Math.floorMod(l, n.toLong).toInt
      case i: Int => Math.floorMod(i.toLong, n.toLong).toInt
      // V2 filter literals arrive as UTF8String while the write path
      // buckets on java String — hash the SAME representation or
      // pruning drops the file that actually holds the value.
      case s: org.apache.spark.unsafe.types.UTF8String =>
        Math.floorMod(s.toString.hashCode.toLong, n.toLong).toInt
      case other => Math.floorMod(other.hashCode.toLong, n.toLong).toInt
    }
    override def eval(v: Any): Option[String] =
      Option(v).map(x => bucketOf(x).toString)
  }

  val PropKey = "partition"

  def fromTransforms(schema: StructType, partitions: Array[Transform]): Seq[Field] =
    partitions.toSeq.map { t =>
      def ref: String = {
        val names = t.references().head.fieldNames()
        require(names.length == 1, "graftlake: nested partition columns not supported")
        require(schema.fieldNames.contains(names.head),
          s"graftlake: partition column ${names.head} not in schema")
        names.head
      }
      t.name() match {
        case "identity" => Identity(ref)
        case "bucket" =>
          val n = t.arguments().collectFirst {
            case l: VLiteral[_] if l.value().isInstanceOf[Number] =>
              l.value().asInstanceOf[Number].intValue()
          }.getOrElse(throw new IllegalArgumentException(
            s"graftlake: bucket transform needs a literal width: $t"))
          require(n > 0, s"graftlake: bucket width must be positive, got $n")
          Bucket(ref, n)
        case other => throw new UnsupportedOperationException(
          s"graftlake: unsupported partition transform $other (identity and bucket only)")
      }
    }

  def encode(fields: Seq[Field]): String = fields.map {
    case Identity(c) => s"id:$c"
    case Bucket(c, n) => s"b$n:$c"
  }.mkString(",")

  def decode(props: Map[String, String]): Seq[Field] =
    props.get(PropKey).filter(_.nonEmpty).map(_.split(',').toSeq.map { s =>
      val Array(kind, col) = s.split(":", 2)
      if (kind == "id") Identity(col)
      else Bucket(col, kind.stripPrefix("b").toInt)
    }).getOrElse(Seq.empty)

  def toTransforms(fields: Seq[Field]): Array[Transform] = fields.map {
    case Identity(c) => Expressions.identity(c)
    case Bucket(c, n) => Expressions.bucket(n, c)
  }.toArray

  /** Row-level tuple evaluator bound to a write schema. */
  def evaluator(fields: Seq[Field], schema: StructType): InternalRow => Seq[Option[String]] = {
    val bound = fields.map { f =>
      val i = schema.fieldIndex(f.col)
      val dt = schema(i).dataType
      (f, i, dt)
    }
    row => bound.map { case (f, i, dt) =>
      if (row.isNullAt(i)) None
      else f.eval(row.get(i, dt) match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.toString
        case other => other
      })
    }
  }

  /** Exact per-file decisions from the partition tuple, consulted by
    * [[LakeStats]] BEFORE the min/max stats. Returns None when the
    * tuple cannot decide (not a partition column, or a bucket column
    * whose bucket matches).
    */
  final class Resolver(fields: Seq[Field], tuple: Seq[Option[String]]) {
    private val byCol: Map[String, (Field, Option[String])] =
      fields.zip(tuple).map { case (f, v) => f.col -> ((f, v)) }.toMap

    /** Some(true) = every row has col = value; Some(false) = none has. */
    def eq(col: String, value: Any): Option[Boolean] = byCol.get(col).flatMap {
      case (Identity(_), Some(fv)) => Some(fv == String.valueOf(value))
      case (Identity(_), None) => Some(false) // all-null partition: = never matches
      case (b @ Bucket(_, _), Some(fv)) =>
        if (b.bucketOf(value).toString != fv) Some(false) else None
      case (Bucket(_, _), None) => Some(false)
    }

    /** Some(true) = every row null in col; Some(false) = none null. */
    def isNull(col: String): Option[Boolean] = byCol.get(col).flatMap {
      case (Identity(_), v) => Some(v.isEmpty)
      case _ => None // a bucket file mixes many values; stats decide
    }
  }

  val NoResolver = new Resolver(Seq.empty, Seq.empty)

  /** The TYPED partition-key values of a file's tuple, in spec order —
    * what [[org.apache.spark.sql.connector.read.HasPartitionKey]]
    * exposes for storage-partitioned joins. Identity components parse
    * back to the column's type; bucket components are their ordinal.
    */
  def keyValues(fields: Seq[Field], tuple: Seq[Option[String]],
      schema: StructType): Array[Any] =
    fields.zip(tuple).map {
      case (_, None) => null
      case (Identity(c), Some(v)) => schema(schema.fieldIndex(c)).dataType match {
        case LongType => v.toLong
        case IntegerType => v.toInt
        case BooleanType => v.toBoolean
        case _ => org.apache.spark.unsafe.types.UTF8String.fromString(v)
      }
      case (Bucket(_, _), Some(v)) => v.toInt
    }.toArray

  def resolver(props: Map[String, String], f: LakeFile): Resolver = {
    val fields = decode(props)
    if (fields.isEmpty || f.part.isEmpty) NoResolver
    else new Resolver(fields, f.part)
  }
}

/** The `bucket` V2 FUNCTION of the lake format, exposed through
  * [[GraftLakeCatalog]]'s FunctionCatalog face. Spark resolves a
  * reported `bucket(n, col)` partitioning into a `TransformExpression`
  * by loading THIS function from the table's own catalog — without it
  * the transform silently drops and storage-partitioned joins between
  * bucket-partitioned tables never engage. Join-side compatibility is
  * decided by `canonicalName` + bucket count equality, and the math
  * here is byte-identical to [[LakePartitioning.Bucket.bucketOf]] (the
  * write path), so the reported key groups are exactly the stored
  * file tuples.
  */
object LakeBucketUnbound extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n INT, col) -> INT: the lake partition transform " +
      "(floorMod of the long value / String.hashCode, matching the write path)"
  override def bind(inputType: StructType):
      org.apache.spark.sql.connector.catalog.functions.BoundFunction = {
    require(inputType.length == 2,
      s"bucket takes (numBuckets INT, col), got ${inputType.simpleString}")
    val ok = inputType(0).dataType == IntegerType && (inputType(1).dataType match {
      case LongType | IntegerType | StringType => true
      case _ => false
    })
    require(ok, s"bucket supports BIGINT/INT/STRING columns, " +
      s"got ${inputType.simpleString}")
    LakeBucketFunction(inputType(1).dataType)
  }
}

case class LakeBucketFunction(colType: DataType)
  extends org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer] {
  override def name(): String = "bucket"
  override def canonicalName(): String = "graftlake.bucket"
  override def inputTypes(): Array[DataType] = Array(IntegerType, colType)
  override def resultType(): DataType = IntegerType
  override def produceResult(input: InternalRow): Integer = {
    if (input.isNullAt(1)) return null
    val n = input.getInt(0)
    val h = colType match {
      case LongType => input.getLong(1)
      case IntegerType => input.getInt(1).toLong
      case StringType => input.getUTF8String(1).toString.hashCode.toLong
    }
    Math.floorMod(h, n.toLong).toInt
  }
}
