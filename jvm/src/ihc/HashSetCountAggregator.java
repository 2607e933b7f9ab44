package ihc;

import org.apache.spark.sql.Encoder;
import org.apache.spark.sql.Encoders;
import org.apache.spark.sql.expressions.Aggregator;

/**
 * The reference UDA's exact lifecycle as a JVM typed aggregate — the
 * one tier the Python rebuild could not provide (a pandas GROUPED_AGG
 * ships whole groups to one worker with no partial/merge split):
 *
 *   zero()        == DistHashSetInit   (hashset-count.cc:82-103):
 *                    fresh empty state per partial aggregation.
 *   reduce(b, v)  == DistHashSetUpdate (cc:105-192): NULL skipped
 *                    (cc:106), value added exactly once ("" counts,
 *                    embedded NUL bytes are ordinary chars — Java
 *                    strings are length-delimited, the trap the
 *                    reference's \0-terminated layout documents).
 *   buffer enc.   == DistHashSetSerialize (cc:195-262): the partial
 *                    state crosses the Exchange as serialized bytes.
 *   merge(a, b)   == DistHashSetMerge (cc:269-461): union-distinct of
 *                    two partial states on the final side.
 *   finish(b)     == DistHashSetFinalize (cc:464-524): decimal STRING
 *                    count; empty state (no non-NULL rows ever seen)
 *                    returns SQL NULL, not "0" (cc:507-510).
 *
 * Spark plans this as partial ObjectHashAggregate -> Exchange ->
 * final merge — structurally identical to the Impala partial/final
 * split the reference plugs into. State is a per-group
 * {@link StringSetBuffer}: a plain in-memory HashSet (reduce is O(1)
 * per row; Aggregator permits buffer reuse) that serializes itself as
 * a front-coded sorted block at the partial/final boundary — compact
 * bytes exactly where the reference serializes, nowhere else.
 */
public final class HashSetCountAggregator
    extends Aggregator<String, StringSetBuffer, String> {

  private static final long serialVersionUID = 2L;

  @Override
  public StringSetBuffer zero() {
    return new StringSetBuffer();
  }

  @Override
  public StringSetBuffer reduce(StringSetBuffer buf, String value) {
    if (value != null) {
      buf.add(value);
    }
    return buf;
  }

  @Override
  public StringSetBuffer merge(StringSetBuffer a, StringSetBuffer b) {
    return a.union(b);
  }

  @Override
  public String finish(StringSetBuffer buf) {
    return buf.isEmpty() ? null : Long.toString(buf.size());
  }

  @Override
  public Encoder<StringSetBuffer> bufferEncoder() {
    // the Serialize boundary: partial state -> bytes across the
    // Exchange. StringSetBuffer is KryoSerializable, so kryo
    // delegates to its front-coded writer (StringSetBuffer.write)
    // instead of the stock CollectionSerializer.
    return Encoders.kryo(StringSetBuffer.class);
  }

  @Override
  public Encoder<String> outputEncoder() {
    return Encoders.STRING();
  }
}
