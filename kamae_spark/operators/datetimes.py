"""Date/time transformers (reference SURVEY.md §2.5). Pure Column exprs.

Time-dependent ops (CurrentDate*, CurrentUnixTimestamp) accept an
optional injected ``now`` (ISO string) so tests are deterministic
without clock freezing (SURVEY.md §5)."""

from __future__ import annotations

from itertools import chain
from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from kamae_spark.core.stage import keyword_params
from kamae_spark.operators.rowwise import ElementwiseTransform

_DATE_PART_PATTERN = {
    # reference date_parse.py:188-199
    "Year": "y",
    "DayOfYear": "D",
    "MonthOfYear": "M",
    "DayOfMonth": "d",
    "DayOfWeek": "E",
    "Hour": "H",
    "Minute": "m",
    "Second": "s",
    "Millisecond": "SSS",
}

_DOW = {"Mon": 1, "Tue": 2, "Wed": 3, "Thu": 4, "Fri": 5, "Sat": 6, "Sun": 7}


class _Now:
    """Mixin: UTC 'now' column, injectable for determinism."""

    def _now(self) -> Column:
        if getattr(self, "now", None):
            return F.to_timestamp(F.lit(self.now))
        return F.to_utc_timestamp(F.localtimestamp(), F.current_timezone())


class CurrentDate(ElementwiseTransform, _Now):
    """UTC today as 'yyyy-MM-dd' string (reference current_date.py:84)."""

    @keyword_params
    def __init__(self, output_col: str, now: str | None = None):
        pass

    @property
    def input_columns(self):
        return []

    def build(self, df):
        return {self.output_col: F.date_format(self._now(), "yyyy-MM-dd")}


class CurrentDateTime(ElementwiseTransform, _Now):
    """UTC now as 'yyyy-MM-dd HH:mm:ss.SSS' string (reference current_date_time.py:91)."""

    @keyword_params
    def __init__(self, output_col: str, now: str | None = None):
        pass

    @property
    def input_columns(self):
        return []

    def build(self, df):
        return {self.output_col: F.date_format(self._now(), "yyyy-MM-dd HH:mm:ss.SSS")}


class CurrentUnixTimestamp(ElementwiseTransform, _Now):
    """Epoch now in seconds or milliseconds (reference current_unix_timestamp.py:92)."""

    @keyword_params
    def __init__(self, output_col: str, unit: str = "s", now: str | None = None):
        if unit not in ("s", "ms"):
            raise ValueError("unit must be s|ms")

    @property
    def input_columns(self):
        return []

    def build(self, df):
        sec = self._now().cast("double")
        out = (sec * 1000).cast("bigint") if self.unit == "ms" else sec.cast("bigint")
        return {self.output_col: out}


class DateAdd(ElementwiseTransform):
    """Add days (constant or 2nd column) to a date string
    (reference date_add.py:173)."""

    compatible_dtypes = None  # string dates or int day columns mix

    @keyword_params
    def __init__(self, input_cols: Sequence[str] = (), output_col: str = "",
                 num_days: int | None = None,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        pass

    def fn(self, *cols: Column) -> Column:
        days = F.lit(self.num_days) if self.num_days is not None else cols[1].cast("int")
        return F.date_format(F.date_add(F.to_date(cols[0]), days), "yyyy-MM-dd")


class DateDiff(ElementwiseTransform):
    """Days between two date columns (reference date_diff.py:107-129)."""

    compatible_dtypes = ("string",)

    @keyword_params
    def __init__(self, input_cols: Sequence[str] = (), output_col: str = "",
                 input_dtype: str | None = None, output_dtype: str | None = None):
        pass

    def fn(self, a: Column, b: Column) -> Column:
        return F.datediff(F.to_date(b), F.to_date(a))


class DateParse(ElementwiseTransform):
    """Extract a date part from a date/datetime string; DayOfWeek remapped
    Mon=1..Sun=7 (reference date_parse.py:152-223)."""

    compatible_dtypes = ("string",)

    @keyword_params
    def __init__(self, input_col: str, output_col: str,
                 date_part: str = "Year", default_value: int | None = None,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        if date_part not in _DATE_PART_PATTERN:
            raise ValueError(f"date_part must be one of {sorted(_DATE_PART_PATTERN)}")

    def fn(self, x: Column) -> Column:
        formatted = F.date_format(x, _DATE_PART_PATTERN[self.date_part])
        if self.date_part == "DayOfWeek":
            mapping = F.create_map([F.lit(v) for v in chain(*_DOW.items())])
            parsed: Column = mapping[formatted]
        else:
            parsed = formatted.cast("int")
        if self.default_value is not None:
            return F.when(x == F.lit(""), F.lit(self.default_value)).otherwise(parsed)
        return parsed


class DateTimeToUnixTimestamp(ElementwiseTransform):
    """Datetime string -> epoch seconds or milliseconds
    (reference date_time_to_unix_timestamp.py:88)."""

    compatible_dtypes = ("string",)

    @keyword_params
    def __init__(self, input_col: str, output_col: str, unit: str = "s",
                 input_dtype: str | None = None, output_dtype: str | None = None):
        if unit not in ("s", "ms"):
            raise ValueError("unit must be s|ms")

    def fn(self, x: Column) -> Column:
        ts = F.to_timestamp(x)
        sec = F.unix_timestamp(ts)
        if self.unit == "s":
            return sec
        ms = (F.date_format(ts, "SSS")).cast("bigint")
        return sec * 1000 + ms


class UnixTimestampToDateTime(ElementwiseTransform):
    """Epoch seconds/milliseconds -> datetime string with optional ms
    precision (reference unix_timestamp_to_date_time.py:104)."""

    compatible_dtypes = ("bigint", "int", "double", "float")

    @keyword_params
    def __init__(self, input_col: str, output_col: str, unit: str = "s",
                 include_millis: bool = False,
                 input_dtype: str | None = None, output_dtype: str | None = None):
        if unit not in ("s", "ms"):
            raise ValueError("unit must be s|ms")

    def fn(self, x: Column) -> Column:
        if self.unit == "ms":
            sec = (x.cast("double") / 1000.0)
        else:
            sec = x.cast("double")
        base = F.date_format(F.timestamp_seconds(sec), "yyyy-MM-dd HH:mm:ss")
        if not self.include_millis:
            return base
        millis = (
            F.when(F.lit(self.unit == "ms"), F.pmod(x.cast("bigint"), 1000))
            .otherwise(F.lit(0))
            .cast("string")
        )
        return F.concat(base, F.lit("."), F.lpad(millis, 3, "0"))
