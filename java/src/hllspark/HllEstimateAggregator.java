package hllspark;

import org.apache.spark.sql.Encoder;
import org.apache.spark.sql.Encoders;
import org.apache.spark.sql.expressions.Aggregator;

/**
 * Same register build as {@link HllRegAggregator}, but finish() computes
 * the distinct-count estimate in the JVM — so approx_distinct is a single
 * ObjectHashAggregate with no Python stage at all (the exact plan shape of
 * Spark's built-in approx_count_distinct).  Use HllRegAggregator when the
 * serialized sketch itself is needed (checkpointing, re-merge).
 */
public class HllEstimateAggregator extends Aggregator<Long, byte[], Double> {
  private final int p;

  public HllEstimateAggregator(int p) {
    HllRegOps.checkP(p);
    this.p = p;
  }

  @Override
  public byte[] zero() {
    return new byte[1 << p];
  }

  @Override
  public byte[] reduce(byte[] regs, Long hash) {
    return HllRegOps.update(regs, hash, p);
  }

  @Override
  public byte[] merge(byte[] a, byte[] b) {
    return HllRegOps.merge(a, b);
  }

  @Override
  public Double finish(byte[] regs) {
    return HllRegOps.estimate(regs);
  }

  @Override
  public Encoder<byte[]> bufferEncoder() {
    return Encoders.BINARY();
  }

  @Override
  public Encoder<Double> outputEncoder() {
    return Encoders.DOUBLE();
  }
}
