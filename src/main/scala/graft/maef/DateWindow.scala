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

  /** The DAG's full `get_date_range` + `validate_date_range` chain
    * (ihc_api_dag.py:40-63):
    *
    *   1. explicit dates (CLI args) win and are validated STRICTLY —
    *      parse or range failures propagate;
    *   2. else the `attribution_start_date`/`attribution_end_date`
    *      Airflow Variables — here a `variables` lookup (env vars in
    *      MaefMain). Missing or unparseable values fall back to the
    *      reference's hardcoded 2023-08-01..09-30 window (the DAG
    *      catches any exception inside `get_date_range`);
    *   3. a window that PARSED from variables is then validated like the
    *      DAG does — validation failures propagate, they are not
    *      swallowed into the fallback (validate_date_range runs outside
    *      the try block).
    */
  def resolve(
      explicit: Option[(String, String)],
      variables: String => Option[String],
      today: LocalDate): Window = explicit match {
    case Some((s, e)) => validate(s, e, today)
    case None =>
      variables("ATTRIBUTION_START_DATE").zip(variables("ATTRIBUTION_END_DATE")) match {
        case Some((s, e)) =>
          val parses =
            try { LocalDate.parse(s, Fmt); LocalDate.parse(e, Fmt); true }
            catch { case _: java.time.format.DateTimeParseException => false }
          if (parses) validate(s, e, today) else ReferenceFallback
        case None => ReferenceFallback
      }
  }
}
