package graft

import org.apache.spark.sql.functions._
import graft.core.Metric
import graft.functions.SqlFunctions

/** The SQL-registered distance functions must plan the SAME native
  * expression as the Column API — identical values, no UDF in the plan —
  * and reject non-literal metrics at plan time. */
class SqlFunctionsSuite extends SparkFunSuite {

  private lazy val emb = {
    SqlFunctions.register(spark)
    val df = spark.read.parquet(s"${SparkTestBase.sf0001}/embeddings.parquet")
    df.createOrReplaceTempView("sqlfn_emb")
    df
  }

  test("SQL text and Column API plan the same values, metric by metric") {
    emb // force registration + view
    val sql = spark.sql(
      """SELECT vec_id,
        |  vector_distance('l2', embedding, embedding) AS z,
        |  l2_distance(embedding, embedding) AS zs,
        |  cosine_distance(embedding, embedding) AS zc
        |FROM sqlfn_emb WHERE vec_id < 50""".stripMargin)
    // self-distance: 0 under l2/l2sqrt/cosine — quick but real codegen run
    assert(sql.filter(col("z") =!= 0.0 || col("zs") =!= 0.0).isEmpty)
    assert(sql.agg(max(abs(col("zc")))).head().getDouble(0) < 1e-9)

    // cross pairs: SQL == Column API bit for bit
    val a = emb.filter(col("vec_id") % 11 === 0)
      .select(col("vec_id").as("aid"), col("embedding").as("avec"))
    val b = emb.filter(col("vec_id") % 13 === 0)
      .select(col("vec_id").as("bid"), col("embedding").as("bvec"))
    val viaCol = a.crossJoin(b).select(col("aid"), col("bid"),
      graft.functions.vector_distance(Metric.Lp, col("avec"), col("bvec"), 3.0).as("d"))
    a.createOrReplaceTempView("sqlfn_a"); b.createOrReplaceTempView("sqlfn_b")
    val viaSql = spark.sql(
      "SELECT aid, bid, vector_distance('lp', avec, bvec, 3.0) AS d " +
        "FROM sqlfn_a CROSS JOIN sqlfn_b")
    assert(viaSql.except(viaCol).isEmpty && viaCol.except(viaSql).isEmpty)
  }

  test("the planned expression is the native VectorDistance, not a UDF") {
    emb
    val plan = spark.sql(
      "SELECT l1_distance(embedding, embedding) FROM sqlfn_emb").queryExecution
      .analyzed.expressions.map(_.toString).mkString
    assert(plan.toLowerCase.contains("vectordistance"),
      s"expected VectorDistance in $plan")
  }

  test("SQL distance functions widen int8/double vector columns (§1.2 dtypes)") {
    emb
    import spark.implicits._
    // Seq[Byte] encodes as array<tinyint> (an Array[Byte] would be
    // BinaryType — a different, deliberately-unsupported thing)
    Seq((1L, Seq(1.toByte, 2.toByte, 3.toByte), Seq(4.toByte, 6.toByte, 8.toByte)))
      .toDF("id", "a", "b").createOrReplaceTempView("sqlfn_i8")
    val d8 = spark.sql("SELECT l2_distance(a, b) AS d FROM sqlfn_i8").head().getDouble(0)
    assert(math.abs(d8 - math.sqrt(9 + 16 + 25)) < 1e-6,
      s"int8 arrays must widen through the implicit cast, got $d8")
    Seq((1L, Array(1.0, 2.0), Array(4.0, 6.0)))
      .toDF("id", "a", "b").createOrReplaceTempView("sqlfn_f64")
    val d64 = spark.sql("SELECT l2_distance(a, b) AS d FROM sqlfn_f64").head().getDouble(0)
    assert(math.abs(d64 - 5.0) < 1e-6, s"double arrays must widen, got $d64")
  }

  test("non-literal or unknown metric fails at plan time") {
    emb
    intercept[Exception] {
      spark.sql("SELECT vector_distance(CAST(vec_id AS STRING), embedding, embedding) " +
        "FROM sqlfn_emb").queryExecution.analyzed
    }
    intercept[Exception] {
      spark.sql("SELECT vector_distance('no_such_metric', embedding, embedding) " +
        "FROM sqlfn_emb").queryExecution.analyzed
    }
  }

  test("knn_join TVF plans the declarative node and matches the Column API route") {
    emb // register() has already installed ResolveKnnJoin alongside the TVF
    val q = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    q.createOrReplaceTempView("sqlfn_q")
    val sqlDf = spark.sql(
      "SELECT * FROM knn_join('sqlfn_emb', 'sqlfn_q', 5, 'l2sqrt', " +
        "'vec_id', 'embedding', 'qid', 'qvec')")
    // the ANALYZED plan must carry the same logical node the Column API
    // builds — proof the SQL surface shares the index-aware lowering
    assert(sqlDf.queryExecution.analyzed.collect {
      case _: graft.plans.KnnJoinPlan => true }.nonEmpty,
      "knn_join TVF did not plan KnnJoinPlan")
    val colDf = graft.plans.KnnJoinPlan.knnJoin(emb, q, 5, Metric.L2Sqrt,
      "vec_id", "embedding")
    assert(sqlDf.collect().toSet == colDf.collect().toSet,
      "SQL TVF route differs from the Column-API route")
    assert(sqlDf.count() == q.count() * 5)
  }

  test("knn_join TVF rejects bad arity and non-literal args at plan time") {
    emb
    intercept[Exception] {
      spark.sql("SELECT * FROM knn_join('sqlfn_emb', 'sqlfn_q', 5)").queryExecution.analyzed
    }
    // an unknown metric name is no longer an ANALYSIS error: it resolves
    // against the session function registry (the CustomUDF metric
    // surface), so the clear failure moves to the lowering — forced here
    // by planning — when no such function is registered either
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM knn_join('sqlfn_emb', 'sqlfn_q', 5, 'no_such_metric', " +
        "'vec_id', 'embedding', 'qid', 'qvec')").queryExecution.executedPlan
    }
    assert(e.getMessage.contains("no_such_metric"), s"unhelpful error: ${e.getMessage}")
  }

  test("knn_join TVF rejects k < 1 and a Long k outside Int range") {
    emb
    for (k <- Seq("0", "-3", "4294967297L")) {
      val e = intercept[Exception] {
        spark.sql(s"SELECT * FROM knn_join('sqlfn_emb', 'sqlfn_q', $k, 'l2sqrt', " +
          "'vec_id', 'embedding', 'qid', 'qvec')").queryExecution.analyzed
      }
      assert(e.getMessage != null, s"k=$k must fail analysis with a message")
    }
  }

  test("knn_join_filtered TVF: deny == Column route, allow is its complement-side") {
    emb
    val q = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    q.createOrReplaceTempView("sqlfn_q")
    val deny = emb.filter(col("vec_id") % 3 === 0).select(col("vec_id"))
    deny.createOrReplaceTempView("sqlfn_deny")
    val sqlDeny = spark.sql(
      "SELECT * FROM knn_join_filtered('sqlfn_emb', 'sqlfn_q', 'sqlfn_deny', " +
        "'deny', 5, 'l2sqrt', 'vec_id', 'embedding', 'qid', 'qvec')")
    // same declarative node as the unfiltered TVF (shared lowering)
    assert(sqlDeny.queryExecution.analyzed.collect {
      case _: graft.plans.KnnJoinPlan => true }.nonEmpty,
      "knn_join_filtered TVF did not plan KnnJoinPlan")
    val colDeny = graft.ops.BruteForceKnn.knnJoinFiltered(emb, q, 5, Metric.L2Sqrt,
      deny = Some(deny), idCol = "vec_id", vecCol = "embedding")
    assert(sqlDeny.collect().toSet == colDeny.collect().toSet,
      "SQL deny route differs from the Column-API knnJoinFiltered route")
    // allow-list over the SAME relation = kNN restricted to the listed ids
    val sqlAllow = spark.sql(
      "SELECT * FROM knn_join_filtered('sqlfn_emb', 'sqlfn_q', 'sqlfn_deny', " +
        "'allow', 5, 'l2sqrt', 'vec_id', 'embedding', 'qid', 'qvec')")
    val colAllow = graft.ops.BruteForceKnn.knnJoin(
      emb.filter(col("vec_id") % 3 === 0), q, 5, Metric.L2Sqrt, "vec_id", "embedding")
    assert(sqlAllow.collect().toSet == colAllow.collect().toSet,
      "SQL allow route differs from the pre-filtered brute route")
    // every returned id respects the deny list
    import spark.implicits._
    val denied = deny.as[Long].collect().toSet
    assert(sqlDeny.select(col("nbr_id")).as[Long].collect().forall(!denied.contains(_)))
    assert(sqlAllow.select(col("nbr_id")).as[Long].collect().forall(denied.contains))
  }

  test("knn_join_filtered 11-arg form joins on the named filter_id_col") {
    emb
    val q = emb.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    q.createOrReplaceTempView("sqlfn_q")
    // the filter relation's ids live under a DIFFERENT column name
    emb.filter(col("vec_id") % 3 === 0).select(col("vec_id").as("banned_id"))
      .createOrReplaceTempView("sqlfn_deny_named")
    val viaSql = spark.sql(
      "SELECT * FROM knn_join_filtered('sqlfn_emb', 'sqlfn_q', 'sqlfn_deny_named', " +
        "'deny', 5, 'l2sqrt', 'vec_id', 'embedding', 'qid', 'qvec', 'banned_id')")
    val viaCol = graft.ops.BruteForceKnn.knnJoinFiltered(emb, q, 5, Metric.L2Sqrt,
      deny = Some(emb.filter(col("vec_id") % 3 === 0).select(col("vec_id"))),
      idCol = "vec_id", vecCol = "embedding")
    assert(viaSql.collect().toSet == viaCol.collect().toSet,
      "named filter_id_col route differs from the Column route")
  }

  test("knn_join_filtered TVF validates mode and arity") {
    emb
    intercept[Exception] {
      spark.sql("SELECT * FROM knn_join_filtered('sqlfn_emb', 'sqlfn_q', 'sqlfn_deny', " +
        "'neither', 5, 'l2sqrt', 'vec_id', 'embedding', 'qid', 'qvec')")
        .queryExecution.analyzed
    }
    intercept[Exception] {
      spark.sql("SELECT * FROM knn_join_filtered('sqlfn_emb', 'sqlfn_q', 'sqlfn_deny')")
        .queryExecution.analyzed
    }
  }

  test("GraftExtensions injects every SQL function into a session registry") {
    // a second SparkContext can't be built in this JVM, so exercise the
    // same path session startup runs: apply the installer to a fresh
    // extensions object and materialize its registry
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.plans.GraftExtensions().apply(ext)
    val reg = org.apache.spark.sql.graft.bridge.applyExtensionFunctions(ext,
      new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry)
    for (name <- Seq("vector_distance", "l2_distance", "l2_squared",
        "cosine_distance", "inner_product", "l1_distance")) {
      assert(reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name missing from the extension-installed registry")
    }
    val treg = org.apache.spark.sql.graft.bridge.applyExtensionTableFunctions(ext,
      new org.apache.spark.sql.catalyst.analysis.SimpleTableFunctionRegistry)
    for (name <- Seq("knn_join", "knn_join_filtered")) {
      assert(treg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)),
        s"$name missing from the extension-installed TABLE function registry")
    }
  }
}
