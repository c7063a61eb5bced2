package hllspark;

import org.apache.spark.sql.Encoder;
import org.apache.spark.sql.Encoders;
import org.apache.spark.sql.expressions.Aggregator;

/**
 * Register-wise max MERGE over already-built raw dense register arrays,
 * finishing to the distinct-count estimate in the JVM.
 *
 * <p>This is the re-aggregation half of the sketch monoid (reference
 * mkarppa/hyperlogloglog HyperLogLog.hpp:124-131 merge + 95-113 estimate)
 * as a Spark typed Aggregator: input rows are byte[2^p] register buffers
 * (the finish() output of {@link HllRegAggregator}), the buffer is the
 * running elementwise max, and finish() runs the Flajolet'07 estimator.
 * Together with HllRegAggregator it lets a multi-grain ROLLUP / GROUPING
 * SETS over sketches run with ZERO Python stages: build fine registers
 * once from the base scan, Expand the tiny fine table once per grain,
 * and merge+estimate each grain group here — one job, two bounded
 * shuffles, all inside whole-stage-planned JVM aggregates.
 *
 * <p>Null inputs (possible after the Expand's outer projections) are
 * ignored; an all-null group keeps the zero() buffer and estimates 0.0.
 * Buffers of mismatched length (different p built upstream) are rejected
 * loudly rather than silently max'd.
 */
public class HllMergeEstimateAggregator extends Aggregator<byte[], byte[], Double> {
  private final int p;

  public HllMergeEstimateAggregator(int p) {
    HllRegOps.checkP(p);
    this.p = p;
  }

  @Override
  public byte[] zero() {
    return new byte[1 << p];
  }

  @Override
  public byte[] reduce(byte[] regs, byte[] in) {
    if (in == null) {
      return regs;
    }
    if (in.length != regs.length) {
      throw new IllegalArgumentException(
          "register buffer length " + in.length + " != 2^p = " + regs.length);
    }
    return HllRegOps.merge(regs, in);
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
