package graft.expressions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF for the reward-payout fold (SURVEY.md §2.10 / A7): one pass
  * over reward events accumulating the three payout components exactly as
  * `processors/engine_comments_contract_processor.py:116-214` does —
  * curation adds to curator+total, beneficiary to beneficiaries+total,
  * author to total only.
  *
  * The buffer is a flat case class of BigDecimals (exact arithmetic like the
  * reference's Python Decimal); merge is associative/commutative so Spark can
  * partial-aggregate map-side — the streaming-friendly form of the batch
  * conditional sums in ContractReplay.
  */
object PayoutAggregator {

  case class RewardEvent(event: String, quantity: BigDecimal)
  case class PayoutBuf(total: BigDecimal, curator: BigDecimal,
                       beneficiaries: BigDecimal)

  val instance: Aggregator[RewardEvent, PayoutBuf, PayoutBuf] =
    new Aggregator[RewardEvent, PayoutBuf, PayoutBuf] {
      private val z = BigDecimal(0)
      override def zero: PayoutBuf = PayoutBuf(z, z, z)
      override def reduce(b: PayoutBuf, e: RewardEvent): PayoutBuf = e.event match {
        case "curationReward" =>
          b.copy(total = b.total + e.quantity, curator = b.curator + e.quantity)
        case "beneficiaryReward" =>
          b.copy(total = b.total + e.quantity,
            beneficiaries = b.beneficiaries + e.quantity)
        case "authorReward" => b.copy(total = b.total + e.quantity)
        case _ => b
      }
      override def merge(a: PayoutBuf, b: PayoutBuf): PayoutBuf =
        PayoutBuf(a.total + b.total, a.curator + b.curator,
          a.beneficiaries + b.beneficiaries)
      override def finish(r: PayoutBuf): PayoutBuf = r
      override def bufferEncoder: Encoder[PayoutBuf] = Encoders.product[PayoutBuf]
      override def outputEncoder: Encoder[PayoutBuf] = Encoders.product[PayoutBuf]
    }
}
