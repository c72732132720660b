package graft.streaming

/**
 * Streaming state evolution discipline. Round 13's addition of the
 * high-water `eventId` to [[StreamEdges.LastVisit]] / [[StreamFunnel
 * .FunnelState]] changed the `flatMapGroupsWithState` encoder schema and
 * stranded every pre-existing checkpoint (Spark's state store rejects an
 * arity change — correctly, since the row bytes would misalign). That
 * class of break is now closed structurally: every stateful fold's state
 * case class carries
 *
 *  - `stateVersion: Int` — the SEMANTIC version of the state, stamped
 *    [[StateVersion.Current]] on every write; and
 *  - `reserved: Map[String, String]` — an extension bag for fields future
 *    versions need, so adding data does NOT change the encoder schema.
 *
 * The NEXT evolution therefore resumes old checkpoints instead of
 * requiring fresh dirs: semantic changes bump the version and branch on
 * it when reading restored state (old rows carry the old number — the
 * tolerant-default contract: absent reserved keys mean "the value this
 * field had before it existed"), and new per-user data lands in
 * `reserved` under a new key. The accessors here centralize the
 * tolerant-default reads so every fold treats missing keys identically.
 *
 * What this does NOT promise: resuming checkpoints written BEFORE this
 * discipline existed (their rows lack the two fields — the one final
 * break, recorded in SURVEY §12's upgrade notes).
 */
object StateVersion {

  /** Version stamped on newly written state. History: 1 = the r13 shape
    * semantics (high-water pair, eager/buffered folds); 2 = first
    * version carrying (stateVersion, reserved) — current. */
  val Current: Int = 2

  /** Guard for the ROLLBACK direction, applied at every restore site:
    * the tolerant-default discipline protects old-state-new-binary, but
    * an OLDER binary restoring state stamped by a FUTURE semantic
    * version would silently fold it with old semantics (and the
    * reserved-bag carry cannot preserve meaning it does not know) — so
    * a higher-than-Current stamp fails loudly, mirroring the
    * loud-corruption stance [[reservedLong]] takes. Returns the state
    * unchanged so restores read `checkRestored(state.getOption)`. */
  def checkRestored[S](state: Option[S])(version: S => Int): Option[S] = {
    state.foreach { s =>
      val v = version(s)
      if (v > Current) throw new IllegalStateException(
        s"restored streaming state carries version $v > Current $Current " +
          "— this binary is older than the one that wrote the checkpoint; " +
          "roll the binary forward (or start a fresh checkpoint dir) " +
          "instead of folding future-versioned state with old semantics")
    }
    state
  }

  /** Tolerant long read: a key absent from `reserved` (state written by
    * an older version, or any version before the key existed) yields
    * `default`. A present-but-unparsable value is a CORRUPTION, not an
    * old version — fail loudly rather than fold garbage. */
  def reservedLong(reserved: Map[String, String], key: String,
      default: Long): Long =
    reserved.get(key) match {
      case None => default
      case Some(s) =>
        try s.toLong
        catch { case _: NumberFormatException =>
          throw new IllegalStateException(
            s"streaming state reserved[$key] is not a long: '$s' — " +
              "corrupted state, not a version skew")
        }
    }

  /** Tolerant string read with the same contract. */
  def reservedString(reserved: Map[String, String], key: String,
      default: String): String =
    reserved.getOrElse(key, default)
}
