package ihc;

import java.util.HashSet;

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
 * split the reference plugs into. State is a per-group HashSet
 * (mutated in place; Aggregator permits buffer reuse), so reduce is
 * O(1) per row and serialization happens only at the partial/final
 * boundary, exactly where the reference serializes.
 */
public final class HashSetCountAggregator
    extends Aggregator<String, HashSet<String>, String> {

  private static final long serialVersionUID = 1L;

  @Override
  public HashSet<String> zero() {
    return new HashSet<>();
  }

  @Override
  public HashSet<String> reduce(HashSet<String> buf, String value) {
    if (value != null) {
      buf.add(value);
    }
    return buf;
  }

  @Override
  public HashSet<String> merge(HashSet<String> a, HashSet<String> b) {
    if (a.size() < b.size()) { // union into the larger side
      b.addAll(a);
      return b;
    }
    a.addAll(b);
    return a;
  }

  @Override
  public String finish(HashSet<String> buf) {
    return buf.isEmpty() ? null : Long.toString(buf.size());
  }

  @SuppressWarnings("unchecked")
  @Override
  public Encoder<HashSet<String>> bufferEncoder() {
    // the Serialize boundary: partial state -> bytes across the
    // Exchange (kryo keeps it compact; the contract is the split
    // itself, not the wire format)
    return Encoders.kryo((Class<HashSet<String>>) (Class<?>) HashSet.class);
  }

  @Override
  public Encoder<String> outputEncoder() {
    return Encoders.STRING();
  }
}
