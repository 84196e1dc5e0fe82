package graft.maef

import java.time.LocalDate
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit

/** P10: date-range parse / validate / default — the reference's
  * DateRangeHandler (src/utils/date_utils.py:6-42) plus the DAG-side
  * validation (dags/ihc_api_dag.py:56-63). Driver-side config logic, plain
  * java.time; the in-plan equivalents are `to_date`/`date_add`/
  * `current_date`.
  *
  * `today` is injectable so validation is testable and reproducible (the
  * reference compares against wall-clock `datetime.now()`).
  */
object DateWindow {

  private val Fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")

  final case class Window(start: LocalDate, end: LocalDate) {
    def startString: String = Fmt.format(start)
    def endString: String = Fmt.format(end)
    def days: Long = ChronoUnit.DAYS.between(start, end)
  }

  /** Parse + validate: ISO dates, end ≥ start, end ≤ today, span ≤ 365 d
    * (date_utils.py:18-26 + ihc_api_dag.py:57-63). */
  def validate(startDate: String, endDate: String, today: LocalDate): Window = {
    val (start, end) =
      try (LocalDate.parse(startDate, Fmt), LocalDate.parse(endDate, Fmt))
      catch {
        case e: java.time.format.DateTimeParseException =>
          throw new IllegalArgumentException(s"Invalid date format or range: ${e.getMessage}")
      }
    require(!end.isBefore(start), "End date must be after start date")
    require(!end.isAfter(today), "End date cannot be in the future")
    require(ChronoUnit.DAYS.between(start, end) <= 365, "Date range cannot exceed 1 year")
    Window(start, end)
  }

  /** Last-30-days default (date_utils.py:33-42). */
  def default(today: LocalDate): Window = Window(today.minusDays(30), today)

  /** The DAG's hardcoded fallback window (ihc_api_dag.py:50-54). */
  val ReferenceFallback: Window =
    Window(LocalDate.of(2023, 8, 1), LocalDate.of(2023, 9, 30))
}
