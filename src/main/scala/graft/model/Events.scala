package graft.model

import java.time.Instant

/** Typed event model mirroring the reference's data model (SURVEY.md §1.2).
  *
  * The reference uses sealed-trait ADTs (`ServerEvent` at
  * reference events.scala:8-67, `ShoppingCartEvent` at
  * reference ShoppingCartEventsGenerator.scala:14-32). Spark encoders can't
  * encode sealed traits, so the unions are flattened to wide case classes
  * with an `eventType` discriminator + nullable variant fields (SURVEY.md
  * §1.3) — the relational normal form of a tagged union.
  */

/** StarCraft server event, flattened union of
  * PlayerRegistered/PlayerOnline/PlayerOffline/PlayerIsLookingForAGame/
  * GameStarted/GameFinished (reference events.scala:19-67).
  */
final case class ServerEvent(
    eventType: String,
    eventTime: Instant,
    playerId: String,
    nickname: String,
    gameId: String,
    mapId: String,
    regionId: String,
    gameType: String) {
  /** `getId` analogue (reference events.scala:27,34,42,50,58,66). */
  def id: String = if (playerId != null) s"$playerId|$nickname" else gameId
}

object ServerEvent {
  def player(kind: String, t: Instant, nickname: String): ServerEvent =
    ServerEvent(kind, t, s"p-$nickname", nickname, null, null, null, null)

  /** The canonical 12-event fixture timeline
    * (reference Windows.scala:49-65; FIXTURES.md A1):
    * offsets in seconds from `start`.
    */
  def fixture(start: Instant = Instant.parse("2022-02-02T00:00:00Z")): Seq[ServerEvent] = {
    def at(s: Long) = start.plusSeconds(s)
    Seq(
      player("PlayerRegistered", at(2), "bob"),
      player("PlayerOnline", at(2), "bob"),
      player("PlayerRegistered", at(3), "sam"),
      player("PlayerOnline", at(4), "sam"),
      player("PlayerRegistered", at(4), "rob"),
      player("PlayerRegistered", at(4), "alice"),
      player("PlayerRegistered", at(6), "mary"),
      player("PlayerOnline", at(6), "mary"),
      player("PlayerRegistered", at(8), "carl"),
      player("PlayerOnline", at(10), "rob"),
      player("PlayerOnline", at(10), "alice"),
      player("PlayerOnline", at(11), "carl"))
  }
}

/** Shopping-cart event union: add|removed
  * (reference ShoppingCartEventsGenerator.scala:20-32).
  */
final case class ShoppingCartEvent(
    eventType: String,
    userId: String,
    sku: String,
    quantity: Int,
    time: Instant)

/** Catalog event (reference ShoppingCartEventsGenerator.scala:166-175). */
final case class CatalogEvent(userId: String, time: Instant, productId: String)
