package graft

import org.apache.spark.sql.SparkSessionExtensions

class ExtensionsSpec extends SparkSpec {
  test("GraftExtensions registers graft_dot into a fresh extensions set") {
    // the injected builder is the same one DotProduct.register uses (whose
    // behavior is covered in ExtensibilitySpec); here we verify the
    // spark.sql.extensions entry point wires up without error
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("session-registry registration makes graft_dot resolvable in SQL") {
    functions.DotProduct.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head().getDouble(0)
    assert(r == 11.0)
  }
}
