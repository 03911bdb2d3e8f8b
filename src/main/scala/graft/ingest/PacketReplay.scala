package graft.ingest

import graft.flow.PacketRow

/** Test-fixture generator standing in for the reference's PCAP→Kafka
  * replay producers (S4, kafka_producer/simulator.py /
  * producer/reader/simulator.py): renders packets as the per-packet
  * JSON contract (DATA_CONTRACT.md:7-36) so the ingest path
  * (PacketIngest.decodePackets) can be exercised without a broker.
  *
  * Timestamps use the producer's "%Y-%m-%d %H:%M:%S.%f" format
  * (kafka_producer/simulator.py:61).
  */
object PacketReplay {

  private val fmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
    .withZone(java.time.ZoneOffset.UTC)

  def timestampStr(tsUs: Long): String =
    fmt.format(java.time.Instant.ofEpochSecond(tsUs / 1000000, (tsUs % 1000000) * 1000))

  /** One packet → contract JSON (tcp fields for protocol 6, udp for 17). */
  def toJson(p: PacketRow): String = {
    val base = Seq(
      s""""timestamp": "${timestampStr(p.ts_us)}"""",
      s""""src_ip": "${p.src_ip}"""",
      s""""dst_ip": "${p.dst_ip}"""",
      s""""length": ${p.length}""",
      s""""protocol": ${p.protocol}""",
      s""""src_port": ${p.src_port}""",
      s""""dst_port": ${p.dst_port}""")
    val proto =
      if (p.protocol == 6)
        Seq(
          s""""tcp_seq": 0""", s""""tcp_ack": 0""", s""""tcp_win": 0""",
          s""""tcp_len": ${p.tcp_len}""",
          s""""cwr_flag": ${p.cwr_flag}""", s""""ece_flag": ${p.ece_flag}""",
          s""""urg_flag": ${p.urg_flag}""", s""""ack_flag": ${p.ack_flag}""",
          s""""psh_flag": ${p.psh_flag}""", s""""rst_flag": ${p.rst_flag}""",
          s""""syn_flag": ${p.syn_flag}""", s""""fin_flag": ${p.fin_flag}""")
      else Seq(s""""udp_len": ${p.udp_len}""")
    (base ++ proto).mkString("{", ", ", "}")
  }
}
