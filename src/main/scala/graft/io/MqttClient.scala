package graft.io

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** MQTT 3.1.1 packet codec — the subset the reference's mqtt input and
  * send-mqtt sink exercise (reference src/input/mqtt.ts:109-213,
  * src/step-functions/send-mqtt.ts:86-185): CONNECT/CONNACK,
  * SUBSCRIBE/SUBACK, PUBLISH at qos 0/1/2 (PUBACK for qos 1, the
  * PUBREC/PUBREL/PUBCOMP handshake for qos 2),
  * UNSUBSCRIBE/UNSUBACK, DISCONNECT. Pure JVM, no client library —
  * same offline-viable pattern as [[RespClient]]/[[AmqpClient]].
  *
  * The reference sets an MQTT 5 `contentType` property on publishes;
  * 3.1.1 has no properties, so that single field is a documented
  * divergence (payload and topic semantics are identical).
  */
object Mqtt {
  val Connect = 1; val Connack = 2; val Publish = 3; val Puback = 4
  val Pubrec = 5; val Pubrel = 6; val Pubcomp = 7
  val Subscribe = 8; val Suback = 9; val Unsubscribe = 10; val Unsuback = 11
  val Pingreq = 12; val Pingresp = 13; val Disconnect = 14

  /** MQTT variable-length "remaining length" (7 bits per byte, MSB
    * continues; max 4 bytes).
    */
  def writeRemainingLength(out: DataOutputStream, n0: Int): Unit = {
    var n = n0
    var continue = true
    while (continue) {
      var digit = n % 128
      n /= 128
      if (n > 0) digit |= 0x80 else continue = false
      out.writeByte(digit)
    }
  }

  def readRemainingLength(in: DataInputStream): Int = {
    var multiplier = 1
    var value = 0
    var digit = 0
    var iterations = 0
    do {
      digit = in.readUnsignedByte()
      value += (digit & 0x7f) * multiplier
      multiplier *= 128
      iterations += 1
      if (iterations > 4) throw new IOException("malformed remaining length")
    } while ((digit & 0x80) != 0)
    value
  }

  def utf8(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8)
    Array[Byte]((b.length >> 8).toByte, (b.length & 0xff).toByte) ++ b
  }
}

/** A pure-JVM MQTT 3.1.1 client over a raw socket. One client per
  * connection, not thread-safe — matches the
  * one-client-per-partition-task lifecycle of
  * [[graft.sinks.BrokerSink]].
  */
final class MqttClient(host: String, port: Int,
                       clientId: String = s"graft-${java.util.UUID.randomUUID().toString.take(8)}",
                       user: Option[String] = None, password: Option[String] = None,
                       connectTimeoutMs: Int = 5000) extends AutoCloseable {
  import Mqtt._

  private val socket = new Socket()
  socket.connect(new InetSocketAddress(host, port), connectTimeoutMs)
  socket.setTcpNoDelay(true)
  private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
  private var packetId = 0
  private val pending = scala.collection.mutable.Queue[(String, Array[Byte], Int)]()

  // ---- CONNECT / CONNACK ----
  locally {
    val payload = new java.io.ByteArrayOutputStream()
    payload.write(utf8(clientId))
    user.foreach(u => payload.write(utf8(u)))
    password.foreach(p => payload.write(utf8(p)))
    var flags = 0x02 // clean session
    if (user.isDefined) flags |= 0x80
    if (password.isDefined) flags |= 0x40
    val vh = new java.io.ByteArrayOutputStream()
    vh.write(utf8("MQTT"))
    vh.write(4) // protocol level 3.1.1
    vh.write(flags)
    vh.write(0); vh.write(0) // keep-alive 0 (disabled)
    writePacket(Connect, 0, vh.toByteArray ++ payload.toByteArray)
    val (tpe, _, body) = readPacket()
    if (tpe != Connack) throw new IOException(s"expected CONNACK, got type $tpe")
    val rc = body(1) & 0xff
    if (rc != 0) throw new IOException(s"mqtt connection refused: code $rc")
  }

  /** SUBSCRIBE → SUBACK; returns the granted qos. */
  def subscribe(topicFilter: String, qos: Int = 0): Int = {
    val pid = nextPacketId()
    val body = Array[Byte]((pid >> 8).toByte, (pid & 0xff).toByte) ++
      utf8(topicFilter) :+ qos.toByte
    writePacket(Subscribe, 0x2, body)
    val ack = expectPacket(Suback)
    ack(2) & 0xff
  }

  def unsubscribe(topicFilter: String): Unit = {
    val pid = nextPacketId()
    writePacket(Unsubscribe, 0x2,
      Array[Byte]((pid >> 8).toByte, (pid & 0xff).toByte) ++ utf8(topicFilter))
    expectPacket(Unsuback)
    ()
  }

  /** Next received PUBLISH as (topic, payload-text); acks qos-1
    * deliveries. None once the broker closes the connection.
    */
  def nextMessage(): Option[(String, String)] = {
    if (pending.nonEmpty) {
      val (t, p, _) = pending.dequeue()
      return Some((t, new String(p, UTF_8)))
    }
    try {
      while (true) {
        val (tpe, flags, body) = readPacket()
        if (tpe == Publish) {
          val (topic, payload, _) = decodePublish(flags, body)
          return Some((topic, new String(payload, UTF_8)))
        } else if (tpe == Pubrel) completeQos2(body)
        // everything else (PINGRESP, stray acks) is skipped
      }
      None
    } catch { case _: EOFException => None }
  }

  /** PUBLISH at qos 0 (fire-and-forget), qos 1 (wait for PUBACK), or
    * qos 2 (full PUBREC → PUBREL → PUBCOMP exactly-once handshake,
    * MQTT 3.1.1 §4.3.3).
    */
  def publish(topic: String, payload: Array[Byte], qos: Int = 0): Unit = {
    require(qos >= 0 && qos <= 2, s"qos must be 0, 1 or 2, got $qos")
    val vh = new java.io.ByteArrayOutputStream()
    vh.write(utf8(topic))
    val pid = if (qos > 0) nextPacketId() else 0
    if (qos > 0) { vh.write(pid >> 8); vh.write(pid & 0xff) }
    writePacket(Publish, qos << 1, vh.toByteArray ++ payload)
    if (qos == 1) { expectPacket(Puback); () }
    else if (qos == 2) {
      expectPacket(Pubrec)
      writePacket(Pubrel, 0x2, Array[Byte]((pid >> 8).toByte, (pid & 0xff).toByte))
      expectPacket(Pubcomp)
      ()
    }
  }

  override def close(): Unit = {
    try { writePacket(Disconnect, 0, Array.empty) }
    catch { case _: IOException => () }
    finally socket.close()
  }

  // ---- packet plumbing ----

  private def nextPacketId(): Int = { packetId += 1; if (packetId > 0xffff) packetId = 1; packetId }

  private def writePacket(tpe: Int, flags: Int, body: Array[Byte]): Unit = {
    out.writeByte((tpe << 4) | flags)
    writeRemainingLength(out, body.length)
    out.write(body)
    out.flush()
  }

  private def readPacket(): (Int, Int, Array[Byte]) = {
    val h = in.read()
    if (h == -1) throw new EOFException("mqtt connection closed")
    val len = readRemainingLength(in)
    val body = in.readNBytes(len)
    if (body.length < len) throw new EOFException("mqtt connection closed mid-packet")
    ((h >> 4) & 0xf, h & 0xf, body)
  }

  /** Wait for a packet type, queueing PUBLISHes that arrive first. */
  private def expectPacket(tpe: Int): Array[Byte] = {
    while (true) {
      val (t, flags, body) = readPacket()
      if (t == tpe) return body
      if (t == Publish) pending.enqueue(decodePublish(flags, body))
      else if (t == Pubrel) completeQos2(body)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Receiver side of the qos-2 handshake: PUBREL → PUBCOMP. */
  private def completeQos2(body: Array[Byte]): Unit =
    writePacket(Pubcomp, 0, Array[Byte](body(0), body(1)))

  /** Returns (topic, payload, qos); starts the delivery ack inline —
    * PUBACK for qos 1, PUBREC for qos 2 (PUBCOMP follows when the
    * broker's PUBREL is read by one of the receive loops).
    */
  private def decodePublish(flags: Int, body: Array[Byte]): (String, Array[Byte], Int) = {
    val qos = (flags >> 1) & 0x3
    val topicLen = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
    val topic = new String(body, 2, topicLen, UTF_8)
    var off = 2 + topicLen
    if (qos > 0) {
      val pid = ((body(off) & 0xff) << 8) | (body(off + 1) & 0xff)
      off += 2
      writePacket(if (qos == 1) Puback else Pubrec, 0,
        Array[Byte]((pid >> 8).toByte, (pid & 0xff).toByte))
    }
    (topic, java.util.Arrays.copyOfRange(body, off, body.length), qos)
  }
}
