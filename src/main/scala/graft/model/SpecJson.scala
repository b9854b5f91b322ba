package graft.model

import org.apache.spark.sql.types.DataType
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.dsl._

/** Pipeline specs as data: a stable JSON codec for [[PipelineSpec]], so
  * pipelines can live in files/configs/catalogs and travel between
  * services — the engine-grade version of the reference's host-language
  * spec dict (pipeline.py:30-32), which only exists inside a Python
  * process. Everything in the DSL is serializable by construction
  * (functions are referenced BY NAME through the registry; predicates are
  * declarative) except [[ConstantCol]], which wraps a live `Column` and is
  * rejected with a clear error.
  *
  * Literals are restricted to JSON scalars; integral literals round-trip
  * as Int when they fit (document Int/Long-sensitive casts with an
  * explicit [[CastTo]]). Data types serialize as Spark DDL strings. */
object SpecJson {

  // ------------------------------------------------------------- values

  private def vJson(v: Any): JValue = v match {
    case null       => JNull
    case s: String  => JString(s)
    case b: Boolean => JBool(b)
    case i: Int     => JInt(i)
    case l: Long    => JInt(l)
    case d: Double  => JDouble(d)
    case f: Float   => JDouble(f.toDouble)
    case other => throw new IllegalArgumentException(
      s"spec literal must be a JSON scalar, got ${other.getClass.getName}")
  }

  private def vFrom(j: JValue): Any = j match {
    case JNull       => null
    case JString(s)  => s
    case JBool(b)    => b
    case JInt(i)     => if (i.isValidInt) i.toInt else i.toLong
    case JLong(l)    => if (l.isValidInt) l.toInt else l
    case JDouble(d)  => d
    case JDecimal(d) => d.toDouble
    case other => throw new IllegalArgumentException(s"unexpected literal: $other")
  }

  // --------------------------------------------------------- predicates

  private def pJson(p: Pred): JValue = p match {
    case Truthy        => JObject("op" -> JString("Truthy"))
    case IsNull        => JObject("op" -> JString("IsNull"))
    case IsNotNull     => JObject("op" -> JString("IsNotNull"))
    case Cmp(op, v)    => JObject("op" -> JString("Cmp"), "cmp" -> JString(op),
      "value" -> vJson(v))
    case In(vs)        => JObject("op" -> JString("In"),
      "values" -> JArray(vs.map(vJson).toList))
    case PredFn(n)     => JObject("op" -> JString("PredFn"), "name" -> JString(n))
    case Not(x)        => JObject("op" -> JString("Not"), "p" -> pJson(x))
    case And(a, b)     => JObject("op" -> JString("And"), "a" -> pJson(a), "b" -> pJson(b))
    case Or(a, b)      => JObject("op" -> JString("Or"), "a" -> pJson(a), "b" -> pJson(b))
  }

  private def pFrom(j: JValue): Pred = {
    val o = j.asInstanceOf[JObject].obj.toMap
    def str(k: String) = o(k).asInstanceOf[JString].s
    str("op") match {
      case "Truthy"    => Truthy
      case "IsNull"    => IsNull
      case "IsNotNull" => IsNotNull
      case "Cmp"       => Cmp(str("cmp"), vFrom(o("value")))
      case "In"        => In(o("values").asInstanceOf[JArray].arr.map(vFrom))
      case "PredFn"    => PredFn(str("name"))
      case "Not"       => Not(pFrom(o("p")))
      case "And"       => And(pFrom(o("a")), pFrom(o("b")))
      case "Or"        => Or(pFrom(o("a")), pFrom(o("b")))
      case other       => throw new IllegalArgumentException(s"unknown pred: $other")
    }
  }

  // --------------------------------------------------------- transforms

  private def tJson(t: Transform): JValue = t match {
    case Id                  => JObject("op" -> JString("Id"))
    case GetKeys             => JObject("op" -> JString("GetKeys"))
    case GetValues           => JObject("op" -> JString("GetValues"))
    case Constant(v)         => JObject("op" -> JString("Constant"), "value" -> vJson(v))
    case CastTo(dt)          => JObject("op" -> JString("CastTo"),
      "type" -> JString(dt.catalogString))
    case Fn(n)               => JObject("op" -> JString("Fn"), "name" -> JString(n))
    case Default(v, p)       => JObject("op" -> JString("Default"),
      "value" -> vJson(v), "cond" -> pJson(p))
    case Get(k, d)           => JObject("op" -> JString("Get"), "key" -> vJson(k),
      "default" -> d.map(vJson).getOrElse(JNothing))
    case Attr(n)             => JObject("op" -> JString("Attr"), "name" -> JString(n))
    case FilterT(p)          => JObject("op" -> JString("Filter"), "pred" -> pJson(p))
    case MapT(x)             => JObject("op" -> JString("Map"), "t" -> tJson(x))
    case Flatten(d)          => JObject("op" -> JString("Flatten"), "depth" -> JInt(d))
    case Gather(ks)          => JObject("op" -> JString("Gather"),
      "keys" -> JArray(ks.map(JString(_)).toList))
    case FoldInKeys(n)       => JObject("op" -> JString("FoldInKeys"),
      "name" -> JString(n))
    case FoldInValue(k, n)   => JObject("op" -> JString("FoldInValue"),
      "key" -> JString(k), "name" -> JString(n))
    case If(c, th, el)       => JObject("op" -> JString("If"), "cond" -> pJson(c),
      "then" -> tJson(th), "else" -> el.map(tJson).getOrElse(JNothing))
    case Create(m)           => JObject("op" -> JString("Create"), "model" -> JString(m))
    case CreateMultiple(m)   => JObject("op" -> JString("CreateMultiple"),
      "model" -> JString(m))
    case Chain(ts)           => JObject("op" -> JString("Chain"),
      "ts" -> JArray(ts.map(tJson).toList))
    case ConstantCol(_, _)   => throw new IllegalArgumentException(
      "ConstantCol wraps a live Column and cannot serialize; use Constant " +
        "or register a nullary Fn")
  }

  private def tFrom(j: JValue): Transform = {
    val o = j.asInstanceOf[JObject].obj.toMap
    def str(k: String) = o(k).asInstanceOf[JString].s
    def opt(k: String): Option[JValue] = o.get(k).filter(_ != JNothing).filter(_ != JNull)
    str("op") match {
      case "Id"             => Id
      case "GetKeys"        => GetKeys
      case "GetValues"      => GetValues
      case "Constant"       => Constant(vFrom(o("value")))
      case "CastTo"         => CastTo(DataType.fromDDL(str("type")))
      case "Fn"             => Fn(str("name"))
      case "Default"        => Default(vFrom(o("value")), pFrom(o("cond")))
      case "Get"            => Get(vFrom(o("key")), opt("default").map(vFrom))
      case "Attr"           => Attr(str("name"))
      case "Filter"         => FilterT(pFrom(o("pred")))
      case "Map"            => MapT(tFrom(o("t")))
      case "Flatten"        => Flatten(o("depth").asInstanceOf[JInt].num.toInt)
      case "Gather"         => Gather(o("keys").asInstanceOf[JArray].arr
        .map(_.asInstanceOf[JString].s))
      case "FoldInKeys"     => FoldInKeys(str("name"))
      case "FoldInValue"    => FoldInValue(str("key"), str("name"))
      case "If"             => If(pFrom(o("cond")), tFrom(o("then")),
        opt("else").map(tFrom))
      case "Create"         => Create(str("model"))
      case "CreateMultiple" => CreateMultiple(str("model"))
      case "Chain"          => Chain(o("ts").asInstanceOf[JArray].arr.map(tFrom))
      case other            => throw new IllegalArgumentException(s"unknown op: $other")
    }
  }

  // --------------------------------------------------------------- spec

  def toJson(spec: PipelineSpec): String = {
    val models = spec.models.values.toList.sortBy(_.name).map { m =>
      JObject("model" -> JString(m.name),
        "fields" -> JArray(m.fields.toList.map(f =>
          JObject("field" -> JString(f.name), "t" -> tJson(f.t)))))
    }
    JsonMethods.compact(JsonMethods.render(JObject("models" -> JArray(models))))
  }

  def fromJson(s: String): PipelineSpec = {
    val root = JsonMethods.parse(s).asInstanceOf[JObject].obj.toMap
    val models = root("models").asInstanceOf[JArray].arr.map { mj =>
      val mo = mj.asInstanceOf[JObject].obj.toMap
      ModelSpec(mo("model").asInstanceOf[JString].s,
        mo("fields").asInstanceOf[JArray].arr.map { fj =>
          val fo = fj.asInstanceOf[JObject].obj.toMap
          FieldSpec(fo("field").asInstanceOf[JString].s, tFrom(fo("t")))
        })
    }
    PipelineSpec(models.map(m => m.name -> m).toMap)
  }
}
