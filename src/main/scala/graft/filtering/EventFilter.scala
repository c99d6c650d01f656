package graft.filtering

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.json4s._
import org.json4s.jackson.JsonMethods

/** AWS Lambda event-filtering syntax compiled to a Catalyst `Column`.
  *
  * Re-expression of the reference's row-at-a-time interpreter
  * (datatoolz/filtering.py:96-155) as a one-time compile to a Spark
  * boolean expression, so filtering runs inside whole-stage codegen and
  * — for native columns — pushes down to the parquet scan.
  *
  * Semantics (matching filtering.py + tests/test_filtering.py):
  *  - OR over the filter list; AND over fields within a filter (nested
  *    dicts AND recursively); OR over the criteria list of a field.
  *  - criteria: scalar equality (null/bool/number/string),
  *    `anything-but` (list), `numeric` ([op, ref, ...] pairs, all must
  *    hold), `exists` (key presence, null value still "exists"),
  *    `prefix` (string values only).
  *  - a missing key fails every criterium except `exists: false`;
  *    a present-but-null value "exists" and equals only `null`.
  *  - Python's numeric tower (`1 == 1.0`, `True == 1`) is mirrored by
  *    comparing numerically-typed values (incl. booleans) as doubles;
  *    cross-type string/number comparisons are always false.
  *  - malformed filters (non-list `anything-but`, odd-length `numeric`,
  *    non-string `prefix`, unknown criterium type / operator) throw
  *    IllegalArgumentException at COMPILE time — the batch analogue of
  *    the reference's per-call ValueError/TypeError
  *    (filtering.py:38-50, 69-71, 111-112).
  *  - deviation (documented): the reference raises TypeError when a
  *    `numeric` op meets a non-numeric VALUE (data-dependent, per row);
  *    a distributed filter treats that row as non-matching instead.
  *
  * Null-vs-missing on semi-structured data uses Spark 4 Variant:
  * `variant_get` returns SQL NULL only for a MISSING path, while a
  * present JSON null is a variant-null (`is_variant_null`), which is
  * exactly the reference's `_get_value` err-vs-None distinction.
  */
object EventFilter {

  // ---- value access abstraction -------------------------------------

  /** A resolved field path: presence + typed views of the value. Each
    * view is NULL when the value is absent or not of that type, so
    * criteria compile to null-safe 2-valued booleans via coalesce. */
  sealed trait ValueRef {
    def present: Column
    def isNullValue: Column

    /** string-typed value or NULL */
    def str: Column

    /** numeric view (booleans count as 0/1, like Python); NULL for
      * strings/objects/arrays — `"1"` must not equal `1`. */
    def num: Column
  }

  private final case class VariantRef(root: Column, path: Seq[String]) extends ValueRef {
    // Spark's variant path parser does not interpret escape sequences
    // inside ['...'] segments, so keys containing a quote or backslash
    // cannot be addressed — reject them at compile time rather than
    // emitting an escape the parser won't honor.
    path.filter(k => k.contains("'") || k.contains("\\")).foreach(k => fail(
      s"JSON field name '$k' contains a quote or backslash, which the variant " +
        "path syntax cannot address; rename the field or pre-extract it to a column"))
    private val p = "$" + path.map(k => "['" + k + "']").mkString
    private def vg = variant_get(root, p, "variant")
    private def schema = schema_of_variant(vg)
    val present: Column = vg.isNotNull
    val isNullValue: Column = coalesce(is_variant_null(vg), lit(false))
    val str: Column = when(schema === "STRING", try_variant_get(root, p, "string"))
    val num: Column = when(schema =!= "STRING", try_variant_get(root, p, "double"))
  }

  private final case class NativeRef(c: Column, dt: DataType) extends ValueRef {
    val present: Column = lit(true) // schema columns exist on every row
    val isNullValue: Column = c.isNull
    val str: Column = dt match {
      case StringType => c
      case _          => lit(null).cast(StringType)
    }
    val num: Column = dt match {
      case _: NumericType | BooleanType => c.cast(DoubleType)
      case _                            => lit(null).cast(DoubleType)
    }
  }

  /** A path that cannot resolve in this schema: behaves like a missing
    * key on every row (only `exists: false` matches). */
  private case object AbsentRef extends ValueRef {
    val present: Column = lit(false)
    val isNullValue: Column = lit(false)
    val str: Column = lit(null).cast(StringType)
    val num: Column = lit(null).cast(DoubleType)
  }

  // ---- public API ----------------------------------------------------

  /** Compile `filterJson` against a DataFrame's schema, for use in
    * `df.filter(...)`. Top-level path segments resolve to native
    * columns (struct fields descend); any column named in `jsonCols`
    * is parsed as a JSON document and deeper segments resolve through
    * it with exact null-vs-missing semantics.
    *
    * The result is a FILTER-context predicate: a non-matching row
    * evaluates to false OR null (both excluded by filter). Leaving
    * nulls un-coalesced is deliberate — a `coalesce(pred, false)`
    * wrapper is opaque to the parquet filter translator and kills
    * scan pushdown for native-column criteria (three-valued logic is
    * only corrected where it changes the answer: under the NOT of
    * `anything-but`). Use `compileStrict` where a real boolean VALUE
    * is needed. */
  def compile(filterJson: String, df: DataFrame, jsonCols: Set[String] = Set.empty): Column =
    compileWith(filterJson, dataFrameResolver(df, jsonCols))

  /** `compile`, coalesced to a 2-valued boolean — the exact value the
    * reference's `Filter.__call__` returns per row. For select-list /
    * value use; in a filter() prefer `compile` (pushdown). */
  def compileStrict(filterJson: String, df: DataFrame, jsonCols: Set[String] = Set.empty): Column =
    coalesce(compile(filterJson, df, jsonCols), lit(false))

  /** Compile against a single JSON-string column holding the whole
    * entry (the direct analogue of the reference filtering a dict);
    * 2-valued like the reference's boolean return. */
  def onJsonString(filterJson: String, jsonStr: Column): Column =
    coalesce(compileWith(filterJson, path => VariantRef(parse_json(jsonStr), path)), lit(false))

  /** Compile with a caller-supplied path resolver. */
  def compileWith(filterJson: String, resolve: Seq[String] => ValueRef): Column = {
    val parsed = JsonMethods.parse(filterJson)
    parsed match {
      case JNull | JNothing    => lit(true)
      case JArray(Nil)         => lit(true)
      case JArray(filters)     =>
        filters.map {
          case JObject(fields) => compileFilter(fields, Nil, resolve)
          case other => fail(s"each filter must be an object, got: $other")
        }.reduce(_ || _)
      case other => fail(s"filters must be a list of objects, got: $other")
    }
  }

  // ---- compiler ------------------------------------------------------

  private def compileFilter(
      fields: List[(String, JValue)],
      root: Seq[String],
      resolve: Seq[String] => ValueRef): Column = {
    val parts = fields.flatMap {
      case (field, JArray(criteria)) =>
        val ref = resolve(root :+ field)
        val ors = criteria.map(c => compileCriterium(ref, c))
        Some(ors.reduceOption(_ || _).getOrElse(lit(false)))
      case (field, JObject(nested)) =>
        Some(compileFilter(nested, root :+ field, resolve))
      // the reference silently skips criteria that are neither list nor
      // dict (filtering.py:149-154) — mirror that
      case _ => None
    }
    parts.reduceOption(_ && _).getOrElse(lit(true))
  }

  /** One criterium → a filter-context predicate Column (false and NULL
    * are both "no match"; NULL is corrected to false only where it
    * sits under a NOT). */
  private def compileCriterium(ref: ValueRef, c: JValue): Column = c match {
    case JNull        => ref.isNullValue
    case JString(s)   => ref.str === lit(s)
    case JInt(n)      => ref.num === lit(n.toDouble)
    case JLong(n)     => ref.num === lit(n.toDouble)
    case JDouble(n)   => ref.num === lit(n)
    case JDecimal(n)  => ref.num === lit(n.toDouble)
    case JBool(b)     => ref.num === lit(if (b) 1.0 else 0.0)

    case JObject(List((kind, body))) => kind match {
      case "anything-but" =>
        val items = body match {
          case JArray(xs) => xs
          case _ => fail("'anything-but' criterium reference must be a list of values")
        }
        // NULL flips meaning under NOT — coalesce each operand here
        val eqAny = items.map(i => coalesce(compileCriterium(ref, i), lit(false)))
          .reduceOption(_ || _).getOrElse(lit(false))
        ref.present && !eqAny

      case "numeric" =>
        val items = body match {
          case JArray(xs) if xs.length % 2 == 0 => xs
          case JArray(_) => fail(
            "'numeric' criterium reference must be an even sized array in form of [operation1, reference_value1, ...]")
          case _ => fail("'numeric' criterium reference must be an array")
        }
        val conds = items.grouped(2).map {
          case List(JString(op), refVal) =>
            val r = lit(numericValue(refVal))
            op match {
              case "="  => ref.num === r
              case ">"  => ref.num > r
              case ">=" => ref.num >= r
              case "<"  => ref.num < r
              case "<=" => ref.num <= r
              case other => fail(s"unknown 'numeric' operator: '$other'")
            }
          case other => fail(s"'numeric' items must be [operator, value] pairs, got: $other")
        }.toList
        // all([]) is True in Python: an empty numeric list matches any
        // present value
        conds.reduceOption(_ && _).getOrElse(lit(true)) && ref.present

      case "exists" =>
        body match {
          case JBool(true)  => ref.present
          case JBool(false) => !ref.present
          case other => fail(s"'exists' criterium reference must be a boolean, got: $other")
        }

      case "prefix" =>
        val p = body match {
          case JString(s) => s
          case _ => fail("'prefix' criterium reference must be a string")
        }
        ref.str.startsWith(p)

      case other => fail(s"unknown criterium type: '$other'")
    }

    case other => fail(s"unsupported criterium: $other")
  }

  private def numericValue(v: JValue): Double = v match {
    case JInt(n)     => n.toDouble
    case JLong(n)    => n.toDouble
    case JDouble(n)  => n
    case JDecimal(n) => n.toDouble
    case JBool(b)    => if (b) 1.0 else 0.0
    case other => fail(s"'numeric' reference value must be a number, got: $other")
  }

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  // ---- path resolution over a DataFrame ------------------------------

  private def dataFrameResolver(df: DataFrame, jsonCols: Set[String]): Seq[String] => ValueRef = {
    val schema = df.schema
    path => {
      val head = path.head
      if (jsonCols.contains(head)) {
        if (path.tail.isEmpty) NativeRef(col(head), StringType)
        else VariantRef(parse_json(col(head)), path.tail)
      } else schema.fields.find(_.name == head) match {
        case None => AbsentRef
        case Some(f) =>
          // descend struct fields; a segment absent from the schema is
          // a missing key on every row
          var cur: Column = col(head)
          var dt: DataType = f.dataType
          var absent = false
          path.tail.foreach { seg =>
            if (!absent) dt match {
              case st: StructType => st.fields.find(_.name == seg) match {
                case Some(sf) => cur = cur.getField(seg); dt = sf.dataType
                case None     => absent = true
              }
              case _ => absent = true
            }
          }
          if (absent) AbsentRef else NativeRef(cur, dt)
      }
    }
  }
}
