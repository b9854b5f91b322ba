package graft.model

import graft.dsl.Transform

/** A pipeline spec — the engine's "query": model → field → transformation
  * AST, mirroring the reference's `Dict[Type[M], Dict[str, Transformation]]`
  * (/root/reference/wrangle_pypes/pipeline.py:30-32). Field order is
  * preserved (the reference iterates the dict in insertion order,
  * pipeline.py:114-117), so it defines output column order. */
final case class FieldSpec(name: String, t: Transform)

final case class ModelSpec(name: String, fields: Seq[FieldSpec]) {
  require(fields.map(_.name).distinct.size == fields.size,
    s"duplicate field names in model $name")
}

final case class PipelineSpec(models: Map[String, ModelSpec]) {
  def apply(model: String): ModelSpec =
    models.getOrElse(model,
      throw new graft.compile.PlanException(s"unknown model: $model"))
  def ++(other: PipelineSpec): PipelineSpec = PipelineSpec(models ++ other.models)
}

object PipelineSpec {
  /** DSL sugar:
    * {{{
    * val spec = PipelineSpec(
    *   Model("Point")("x" -> Get("x"), "y" -> Get("y")),
    *   Model("Square")("a" -> (Get("A") | Create("Point"))))
    * }}} */
  def apply(models: ModelSpec*): PipelineSpec =
    PipelineSpec(models.map(m => m.name -> m).toMap)
}

object Model {
  def apply(name: String)(fields: (String, Transform)*): ModelSpec =
    ModelSpec(name, fields.map { case (n, t) => FieldSpec(n, t) })
}
