package graft.core

/** Typed failure hierarchy for the engine.
  *
  * Parity with the reference's exception tree (reference:
  * locopy/errors.py:19-68 — CredentialsError, DBError, ConnectionError,
  * DisconnectionError, S3Error plus upload/download/deletion variants,
  * CompressionError, LocopySplitError, LocopyConcatError,
  * LocopyIgnoreHeaderError). Here the warehouse/S3-specific failures
  * collapse into engine-native categories: session, SQL execution,
  * staging IO, and load/unload option validation.
  */
sealed abstract class GraftError(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

/** Session lifecycle failure (reference: ConnectionError/DisconnectionError). */
final class SessionError(msg: String, cause: Throwable = null)
    extends GraftError(msg, cause)

/** SQL execution failure (reference: DBError, locopy/errors.py:31). */
final class ExecError(msg: String, cause: Throwable = null)
    extends GraftError(msg, cause)

/** Staging / filesystem transfer failure (reference: S3Error family,
  * locopy/errors.py:39-55). */
final class StageError(msg: String, cause: Throwable = null)
    extends GraftError(msg, cause)

/** Invalid or unsupported load/unload option (reference: ValueError raises
  * in locopy/snowflake.py:314-317 and LocopyIgnoreHeaderError,
  * locopy/errors.py:63-68). */
final class OptionError(msg: String) extends GraftError(msg)

/** File split/compress/concat utility failure (reference:
  * CompressionError/LocopySplitError/LocopyConcatError,
  * locopy/errors.py:56-62). */
final class FileOpError(msg: String, cause: Throwable = null)
    extends GraftError(msg, cause)

/** Schema-inference failure. */
final class InferError(msg: String) extends GraftError(msg)

/** Connection-config failure (reference: CredentialsError,
  * locopy/errors.py:19-26 — raised by read_config_yaml on unreadable /
  * malformed YAML, locopy/utility.py:262-266). */
final class CredentialsError(msg: String, cause: Throwable = null)
    extends GraftError(msg, cause)

/** Incoming data's schema drifted from the target table's (the engine
  * surface for the reference's implicit contract that COPY fails on a
  * schema mismatch, locopy/redshift.py:224-229 — there the warehouse
  * raises; here the pre-write gate does, with the structured diff in
  * the message). */
final class SchemaDriftError(msg: String) extends GraftError(msg)
