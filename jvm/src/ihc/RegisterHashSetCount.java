package ihc;

import org.apache.spark.sql.SparkSession;
import org.apache.spark.sql.Encoders;
import org.apache.spark.sql.functions;

/** Py4J entry point: register the JVM tier under a SQL name. */
public final class RegisterHashSetCount {
  private RegisterHashSetCount() {}

  public static void register(SparkSession spark, String name) {
    spark.udf().register(
        name,
        functions.udaf(new HashSetCountAggregator(), Encoders.STRING()));
  }
}
