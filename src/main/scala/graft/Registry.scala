package graft

/** Single source of truth for the driver contract: every operator from
  * SURVEY.md §2 is authored exactly once as a [[QuerySpec]] in one of the
  * ops modules; `SparkEntry.queries` / `SparkEntry.oracleSql` are derived
  * views of this list.
  */
object Registry {
  lazy val all: Seq[QuerySpec] = Seq(
    ops.Relational.specs,
    ops.Joins.specs,
    ops.Windows.specs,
    ops.Scalars.specs,
    ops.TextSim.specs,
    ops.Sketches.specs,
    ops.Events.specs,
    ops.Udx.specs,
    ops.Clustering.specs,
    ops.Learn.specs,
    ops.Graph.specs,
    ops.SeaSegment.specs
  ).flatten

  lazy val byName: Map[String, QuerySpec] = {
    val names = all.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate query names: ${names.diff(names.distinct).mkString(",")}")
    all.map(q => q.name -> q).toMap
  }
}
