package graft

import org.apache.spark.sql.functions._

/** Routed-E-step operating curve (the [[AnnCurve]] discipline applied
  * to the two-level k-means assignment): for one corpus and one K,
  * measure routed-vs-flat assignment agreement and distance-eval work
  * across the probe knob — the curve a pipeline reads to pick
  * `spark.graft.kmeans.rprobe`, exactly like recall/nprobe for IVF.
  * Isotropic corpora are routing's WORST case (no similarity gap, so
  * every branch boundary is contested); clustered real corpora sit
  * above this curve.
  *
  *   sbt "runMain graft.RouteCurve [dir] [k] [probes...]"
  *
  * One JSON line per probe point on stdout.
  */
object RouteCurve {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(160)
    val probes = if (args.length > 2) args.drop(2).map(_.toInt).toSeq
                 else Seq(1, 2, 3, 4, 6, 8)
    val s = Local.session(defaultCpus = "32")
    val b = ops.Clustering.base(s, dir)
    val n = b.count()
    // exact-path training: the curve isolates ASSIGNMENT error, so
    // both sides must score against the same exactly-trained centroids
    s.conf.set("spark.graft.kmeans.estep", "join")
    val cents = ops.Clustering.centroids(s, dir, k)
    val flat = ops.Clustering.assignJoin(b, cents)
      .select(col("vec_id"), col("cid").as("cf")).localCheckpoint(true)
    for (p <- probes) {
      s.conf.set("spark.graft.kmeans.rprobe", p.toString)
      val routed = ops.Clustering.assignRouted(b, cents)
        .select(col("vec_id"), col("cid").as("cr"))
      val agree = flat.join(routed, "vec_id")
        .filter(col("cf") === col("cr")).count()
      val evals = ops.Clustering.routedEstepEvals(b, cents)
      println(s"""{"dir":"$dir","k":$k,"rprobe":$p,"n":$n,""" +
        f""""agree":${agree.toDouble / n}%.4f,"evals":$evals,""" +
        s""""evals_flat":${n * k}}""")
    }
    s.stop()
  }
}
