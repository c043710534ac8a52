package graft.functions

import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.unsafe.types.UTF8String

/** SQLite date/time functions: `date`, `time`, `datetime`, `julianday`
  * and the `strftime` core (SURVEY.md §2.2 "scalar: date"; base
  * time-value forms — ISO-8601 text or julian day numbers — without
  * the modifier list, which the reference never exercises). Invalid
  * input returns SQL NULL like SQLite. All outputs pinned against
  * sqlite3 in CliSpec.
  */
object SqliteDate {

  private val SecondsPerDay = 86400.0
  /** Julian day of the Unix epoch 1970-01-01T00:00Z. */
  private val EpochJd = 2440587.5

  /** Parse a SQLite time value: ISO text (date, or date + time) or a
    * julian day number. Returns UTC LocalDateTime. */
  def parse(v: String): Option[LocalDateTime] = {
    if (v == null) return None
    val t = v.trim
    try {
      if (t.matches("[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)")) {
        val jd = t.toDouble
        val epochSec = (jd - EpochJd) * SecondsPerDay
        Some(LocalDateTime.ofEpochSecond(
          math.floor(epochSec).toLong,
          ((epochSec - math.floor(epochSec)) * 1e9).toInt, ZoneOffset.UTC))
      } else if (t.matches("\\d{4}-\\d{2}-\\d{2}")) {
        Some(LocalDate.parse(t).atStartOfDay)
      } else if (t.matches("\\d{4}-\\d{2}-\\d{2}[ T]\\d{2}:\\d{2}(:\\d{2}(\\.\\d+)?)?")) {
        val norm = t.replace(' ', 'T')
        val padded = if (norm.length == 16) norm + ":00" else norm
        Some(LocalDateTime.parse(padded))
      } else None
    } catch { case _: Exception => None }
  }

  private def fmt(v: UTF8String, pattern: String): UTF8String =
    parse(if (v == null) null else v.toString)
      .map(dt => UTF8String.fromString(dt.format(DateTimeFormatter.ofPattern(pattern))))
      .orNull

  def date(v: UTF8String): UTF8String = fmt(v, "yyyy-MM-dd")
  def time(v: UTF8String): UTF8String = fmt(v, "HH:mm:ss")
  def datetime(v: UTF8String): UTF8String = fmt(v, "yyyy-MM-dd HH:mm:ss")

  def julianday(v: UTF8String): java.lang.Double =
    parse(if (v == null) null else v.toString).map { dt =>
      val sec = dt.toEpochSecond(ZoneOffset.UTC) + dt.getNano / 1e9
      Double.box(EpochJd + sec / SecondsPerDay)
    }.orNull

  /** SQLite strftime core substitutions (%%-escape honored). */
  def strftime(fmtSpec: UTF8String, v: UTF8String): UTF8String = {
    val dtOpt = parse(if (v == null) null else v.toString)
    if (fmtSpec == null || dtOpt.isEmpty) return null
    val dt = dtOpt.get
    val spec = fmtSpec.toString
    val sb = new StringBuilder
    var i = 0
    while (i < spec.length) {
      if (spec.charAt(i) == '%' && i + 1 < spec.length) {
        spec.charAt(i + 1) match {
          case 'Y' => sb.append(f"${dt.getYear}%04d")
          case 'm' => sb.append(f"${dt.getMonthValue}%02d")
          case 'd' => sb.append(f"${dt.getDayOfMonth}%02d")
          case 'H' => sb.append(f"${dt.getHour}%02d")
          case 'M' => sb.append(f"${dt.getMinute}%02d")
          case 'S' => sb.append(f"${dt.getSecond}%02d")
          case 'j' => sb.append(f"${dt.getDayOfYear}%03d")
          case 'w' => sb.append(dt.getDayOfWeek.getValue % 7) // Sunday=0
          case 's' => sb.append(dt.toEpochSecond(ZoneOffset.UTC))
          case 'J' => sb.append(julianday(v))
          case '%' => sb.append('%')
          case c => sb.append('%').append(c)
        }
        i += 2
      } else { sb.append(spec.charAt(i)); i += 1 }
    }
    UTF8String.fromString(sb.toString)
  }
}
