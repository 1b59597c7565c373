package graft.streaming

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

/** SCHEMA-REGISTRY SEAM — the component the reference's
  * `AvroConsumer` gets from a Confluent registry
  * (`src/consumer/avro_order_consumer.py` constructs its consumer
  * around registry-resolved schemas). The sandbox has no registry
  * service, so — like the Kafka broker seam ([[OrderStream]] /
  * `sources/OrdersSource`) — the CLIENT interface is real and the
  * transport is swappable: a production deployment implements
  * [[SchemaRegistryClient]] against the HTTP registry; this repo
  * ships a file-backed one with identical semantics.
  *
  * The WIRE FORMAT is the public Confluent framing (documented in the
  * Confluent serializer docs): byte 0 = magic 0x00, bytes 1-4 =
  * big-endian int32 schema id, rest = Avro binary payload encoded
  * with the WRITER schema the id names. Decoding looks the writer
  * schema up by id and resolves it against the consumer's READER
  * schema (Avro schema resolution: renamed-with-alias, added-field
  * defaults, promoted types) — so a topic can carry MIXED schema
  * versions and one consumer reads them all, which is the entire
  * point of pairing a registry with Avro.
  */
trait SchemaRegistryClient {

  /** Register `schema` under `subject`; idempotent per (subject,
    * canonical schema) — re-registering the same schema returns the
    * existing id (the Confluent contract). */
  def register(subject: String, schema: Schema): Int

  /** The schema an id names; throws loudly on an unknown id (a
    * consumer must NEVER guess a writer schema). */
  def byId(id: Int): Schema

  /** Latest registered schema for a subject, if any. */
  def latest(subject: String): Option[(Int, Schema)]

  /** All registered subject names (Confluent's GET /subjects). */
  def subjects(): Seq[String]
}

/** File-backed registry: ids are allocated sequentially and persisted
  * as `<dir>/<id>.avsc` plus a `<dir>/subjects/<subject>` file listing
  * its version ids in order — a directory IS the registry, so two
  * processes sharing the dir share the registry (the single-node
  * stand-in for the registry service). Id allocation is atomic
  * cross-process (`CREATE_NEW` claim loop, see [[claimNextId]]);
  * subject version lists additionally synchronize on the instance,
  * so concurrent registrations NEVER collide on an id (distinct
  * subjects registering concurrently from different processes may
  * interleave id order, which the Confluent contract permits). */
final class FileSchemaRegistry(dir: String) extends SchemaRegistryClient {
  private val root: Path = {
    val p = Paths.get(dir)
    Files.createDirectories(p.resolve("subjects"))
    p
  }

  private def schemaPath(id: Int): Path = root.resolve(s"$id.avsc")
  private def subjectPath(subject: String): Path =
    root.resolve("subjects").resolve(subject)

  private def subjectIds(subject: String): Seq[Int] = {
    val p = subjectPath(subject)
    if (!Files.exists(p)) Seq.empty
    else Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty).map(_.toInt)
  }

  /** Highest id with an `<id>.avsc` on disk (0 if none); the stream
    * is closed eagerly — `Files.list` leaks an fd per call otherwise. */
  private def maxId(): Int = {
    val stream = Files.list(root)
    try {
      stream.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(".avsc"))
        .map(_.stripSuffix(".avsc").toInt)
        .foldLeft(0)(math.max)
    } finally stream.close()
  }

  /** Atomically claim the next free id CROSS-PROCESS: `CREATE_NEW`
    * either wins the id or throws `FileAlreadyExistsException` (a
    * concurrent registrant claimed it first), in which case we retry
    * at the next id. Two instances sharing the dir can therefore never
    * allocate the same id and overwrite each other's writer schema —
    * the silent-mis-decode failure a registry exists to prevent. The
    * claimed file is created empty and filled immediately after;
    * [[byId]] on a just-claimed-not-yet-written id would read an empty
    * schema, so claim+write happens before the id is published in the
    * subject's version list (readers discover ids via that list or via
    * frames already encoded with them). */
  private def claimNextId(canon: String): Int = {
    var id = maxId() + 1
    var claimed = false
    while (!claimed) {
      try {
        Files.createFile(schemaPath(id)) // CREATE_NEW semantics: atomic
        claimed = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => id += 1
      }
    }
    Files.writeString(schemaPath(id), canon)
    id
  }

  /** The whole register operation (dedup lookup → id claim → subject
    * append) runs under a REGISTRY-WIDE lock: a JVM-wide per-dir
    * monitor (two instances in one JVM must not race each other into
    * `FileLock`'s OverlappingFileLockException) plus an OS `FileLock`
    * on `<dir>/.lock` for cross-process exclusion — otherwise the
    * subject version list is a read-modify-write that loses concurrent
    * registrations, and two processes registering the SAME schema can
    * mint two ids (breaking the Confluent idempotency contract). The
    * CREATE_NEW id claim stays as a belt-and-braces invariant for any
    * writer that bypasses the lock. */
  private def withRegistryLock[A](body: => A): A =
    FileSchemaRegistry.monitorFor(root.toString).synchronized {
      val lockPath = root.resolve(".lock")
      val ch = java.nio.channels.FileChannel.open(lockPath,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try {
        val lock = ch.lock()
        try body finally lock.release()
      } finally ch.close()
    }

  /** Rewrite a subject's version list ATOMICALLY: readers
    * (`subjectIds` → `latest`/`byId` chains) take no lock, so a
    * truncate-then-write (`Files.writeString` on the live path) would
    * expose an empty or partial list mid-registration to a
    * cross-process reader — it would resolve no/stale latest version.
    * Temp file in the same directory + ATOMIC_MOVE means a reader
    * always sees either the old complete list or the new complete
    * list, never a torn one. */
  private def writeSubjectList(subject: String, content: String): Unit = {
    val target = subjectPath(subject)
    val tmp = Files.createTempFile(target.getParent, s".$subject.", ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, target,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  override def register(subject: String, schema: Schema): Int =
    withRegistryLock {
      val canon = schema.toString // canonical-enough: parsed form
      val existing = subjectIds(subject)
        .find(id => byId(id).toString == canon)
      existing.getOrElse {
        val id = claimNextId(canon)
        val prior =
          if (Files.exists(subjectPath(subject)))
            Files.readString(subjectPath(subject))
          else ""
        writeSubjectList(subject, prior + s"$id\n")
        id
      }
    }

  override def byId(id: Int): Schema = {
    val p = schemaPath(id)
    require(Files.exists(p),
      s"schema registry: unknown schema id $id (registry dir $dir) — " +
        "refusing to guess a writer schema")
    new Schema.Parser().parse(Files.readString(p))
  }

  override def latest(subject: String): Option[(Int, Schema)] =
    subjectIds(subject).lastOption.map(id => id -> byId(id))

  /** Subject names = files in `<dir>/subjects/`, skipping the
    * in-flight atomic-rename temp files (`.<subject>.*.tmp`). */
  override def subjects(): Seq[String] = {
    val dir = root.resolve("subjects")
    val stream = Files.list(dir)
    try stream.iterator().asScala
      .map(_.getFileName.toString)
      .filterNot(n => n.startsWith(".") && n.endsWith(".tmp"))
      .toSeq
    finally stream.close()
  }
}

object FileSchemaRegistry {
  /** One monitor per registry dir, JVM-wide: serializes instances of
    * the same registry inside one JVM before the cross-process
    * `FileLock` is taken (overlapping JVM-internal FileLocks throw). */
  private val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def monitorFor(dir: String): Object =
    monitors.computeIfAbsent(dir, _ => new Object)
}

object ConfluentWire {
  val Magic: Byte = 0x00

  /** Frame an Avro binary payload with the Confluent wire header. */
  def frame(schemaId: Int, payload: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(5 + payload.length)
    out.put(Magic).putInt(schemaId).put(payload)
    out.array()
  }

  /** Split a framed message into (schema id, payload); loud on a
    * non-Avro frame (wrong magic byte = someone published JSON or a
    * different serializer onto the topic — the DLQ class, never a
    * silent mis-decode). */
  def unframe(bytes: Array[Byte]): (Int, Array[Byte]) = {
    require(bytes.length >= 5 && bytes(0) == Magic,
      s"confluent wire: bad frame (len ${bytes.length}, " +
        s"magic ${if (bytes.isEmpty) "none" else bytes(0).toString}) — " +
        "not an Avro-serialized message")
    val buf = ByteBuffer.wrap(bytes)
    buf.get()
    val id = buf.getInt()
    (id, bytes.drop(5))
  }

  /** Encode a record with its writer schema and frame it under the
    * registry-assigned id (the producer half). */
  def encode(registry: SchemaRegistryClient, subject: String,
      record: GenericRecord): Array[Byte] = {
    val id = registry.register(subject, record.getSchema)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](record.getSchema)
      .write(record, enc)
    enc.flush()
    frame(id, out.toByteArray)
  }

  /** Decode a framed message: writer schema from the registry BY ID,
    * resolved against the consumer's `reader` schema (Avro schema
    * resolution fills added-field defaults, follows aliases) — the
    * mixed-version-topic consumer half. */
  def decode(registry: SchemaRegistryClient, reader: Schema,
      bytes: Array[Byte]): GenericRecord = {
    val (id, payload) = unframe(bytes)
    val writer = registry.byId(id)
    val dec = DecoderFactory.get().binaryDecoder(payload, null)
    new GenericDatumReader[GenericRecord](writer, reader)
      .read(null, dec)
  }
}
