package org.apache.spark.sql.graftshim

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{Collect, ImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** `bounded_collect_list(child, limit)` — `collect_list` whose aggregation
  * buffer NEVER grows past `limit + 1` elements, for group-by-key list
  * builds that are followed by an over-cap group DROP (the hot-key cap
  * pattern: per-user item lists under `MaxItemsPerUser`, per-bucket member
  * lists under `MaxBucket`).
  *
  * Plain `collect_list` buffers a group's ENTIRE list before the cap filter
  * can see its size, so one adversarial hot key (a bot user touching 10⁶
  * items) materializes an unbounded single-group buffer that cannot spill —
  * the exact skew failure the caps exist to prevent. This variant stops
  * appending at `limit + 1`: groups within the cap collect their full list
  * untruncated (partial buffers of one group sum to ≤ limit elements, so no
  * partial ever trips the bound before the final merge), while any group
  * past the cap surfaces as a `limit + 1`-long list — still recognizably
  * over-cap for the caller's `size(...) > limit` / count-based drop, at
  * O(limit) memory instead of O(group).
  *
  * The truncated CONTENTS of an over-cap group are partition-order-
  * dependent and must never be read — callers drop those rows. Within-cap
  * groups are bit-identical to `collect_list` (same append path, same
  * element conversion, same nondeterministic-order contract).
  */
case class BoundedCollectList(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(limit > 0, s"bounded_collect_list limit must be positive, got $limit")

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty

  override protected lazy val bufferElementType: DataType = child.dataType

  override def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)

  override def update(buffer: mutable.ArrayBuffer[Any],
      input: InternalRow): mutable.ArrayBuffer[Any] =
    if (buffer.length > limit) buffer else super.update(buffer, input)

  override def merge(buffer: mutable.ArrayBuffer[Any],
      other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    // append only the prefix of `other` that still fits the bound (r16
    // advice): concatenate-then-truncate transiently held up to
    // 2·(limit + 1) elements per merge of two over-cap partials; the
    // prefix append keeps the bound tight through the merge itself.
    // Within-cap groups append `other` whole — identical to before.
    val room = (limit + 1) - buffer.length
    if (room <= 0) buffer
    else if (other.length <= room) buffer.addAll(other)
    else buffer.addAll(other.view.slice(0, room))
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toSeq)

  override def withNewMutableAggBufferOffset(
      newOffset: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(
      newOffset: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = newOffset)

  override def prettyName: String = "bounded_collect_list"

  override protected def withNewChildInternal(
      newChild: Expression): BoundedCollectList = copy(child = newChild)
}
