package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registry query reproduces its pinned sf0.001 golden exactly
  * (see [[Golden]]; regenerate with Test/runMain graft.GoldenGen after
  * an intentional change).
  */
class GoldenSpec extends AnyFunSuite {
  private lazy val goldens = Golden.load()

  test("golden file covers exactly the registered queries") {
    assert(goldens.keySet === Registry.all.map(_.name).toSet)
  }

  Registry.all.sortBy(_.name).foreach { spec =>
    test(s"golden: ${spec.name}") {
      val (n, h) = Golden.canonical(spec.df(TestSpark.spark, TestSpark.sf))
      val (gn, gh) = goldens(spec.name)
      assert(n === gn, s"row count drifted for ${spec.name}")
      assert(h === gh, s"content hash drifted for ${spec.name}")
    }
  }
}
