"""Fetch schedules as pure column programs.

Ports of DefaultFetchSchedule.java:33-44, AdaptiveFetchSchedule.java:95-144
and AbstractFetchSchedule.java:107-158. Each helper takes/returns dicts of
Columns so the updatedb merge can compose them inside one select — no
per-row Python, everything stays in whole-stage codegen.

Times are epoch ms (long), intervals seconds (int) — identical units to
the reference, so the arithmetic is bit-equal.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import SECONDS_PER_DAY, CrawlConfig
from ..schema import META_CONTENT_TYPE, META_FIXED_INTERVAL

# FetchSchedule.STATUS_* constants
STATE_UNKNOWN = 0
STATE_MODIFIED = 1
STATE_NOTMODIFIED = 2


def calculate_last_fetch_time(fetch_time: Column,
                              fetch_interval: Column) -> Column:
    """AbstractFetchSchedule.java:156-158."""
    return fetch_time - fetch_interval.cast("long") * 1000


def initialize_schedule(cfg: CrawlConfig, now_ms: int) -> dict[str, Column]:
    """AbstractFetchSchedule.initializeSchedule (lines 71-76)."""
    return {
        "fetch_time": F.lit(now_ms).cast("long"),
        "fetch_interval": F.lit(cfg.db_fetch_interval_default).cast("int"),
        "retries": F.lit(0).cast("int"),
    }


def set_fetch_schedule(cfg: CrawlConfig, *, fetch_time: Column,
                       fetch_interval: Column, modified_time: Column,
                       prev_modified_time: Column, state: Column,
                       metadata: Column) -> dict[str, Column]:
    """setFetchSchedule for the configured schedule.

    default (DefaultFetchSchedule.java:33-44): next = fetchTime +
    interval*1000, retries reset.
    adaptive (AdaptiveFetchSchedule.java:95-144): interval scaled by
    ±rate per modification state, optional sync-delta shift, clamped.
    """
    if cfg.fetch_schedule == "default":
        return {
            "fetch_time": fetch_time + fetch_interval.cast("long") * 1000,
            "fetch_interval": fetch_interval,
            "retries": F.lit(0).cast("int"),
            "modified_time": modified_time,
        }

    # adaptive / mime_adaptive
    interval = fetch_interval.cast("double")
    interval = F.when(interval == 0,
                      F.lit(float(cfg.db_fetch_interval_default))) \
        .otherwise(interval)
    fixed = F.element_at(F.coalesce(metadata, F.create_map()),
                         META_FIXED_INTERVAL).cast("double")

    inc_rate = F.lit(float(cfg.adaptive_inc_rate))
    dec_rate = F.lit(float(cfg.adaptive_dec_rate))
    if cfg.fetch_schedule == "mime_adaptive" and cfg.mime_rates:
        # MimeAdaptiveFetchSchedule.java:103-127: per-row INC/DEC from
        # the Content-Type metadata key, cleaned by splitting on ';'
        # (MimeUtil.cleanMimeType:117-130), defaulting to the adaptive
        # rates when the mime is absent from the table. The rate table
        # is a map literal — the lookup stays in codegen.
        ct = F.element_at(F.coalesce(metadata, F.create_map()),
                          META_CONTENT_TYPE)
        clean = F.split(ct, ";").getItem(0)
        inc_map = F.create_map(
            *[c for m, i, _ in cfg.mime_rates
              for c in (F.lit(m), F.lit(float(i)))])
        dec_map = F.create_map(
            *[c for m, _, d in cfg.mime_rates
              for c in (F.lit(m), F.lit(float(d)))])
        inc_rate = F.coalesce(F.element_at(inc_map, clean), inc_rate)
        dec_rate = F.coalesce(F.element_at(dec_map, clean), dec_rate)

    mtime = F.when(modified_time <= 0, fetch_time).otherwise(modified_time)
    scaled = F.when(state == STATE_MODIFIED,
                    interval * (F.lit(1.0) - dec_rate)) \
        .when(state == STATE_NOTMODIFIED,
              interval * (F.lit(1.0) + inc_rate)) \
        .otherwise(interval)

    if cfg.adaptive_sync_delta:
        delta = (fetch_time - mtime) / F.lit(1000.0)
        scaled = F.when(delta > scaled, delta).otherwise(scaled)
        ref_time = fetch_time - F.round(
            delta * cfg.adaptive_sync_delta_rate * 1000).cast("long")
    else:
        ref_time = fetch_time
    clamped = F.greatest(
        F.least(scaled, F.lit(cfg.adaptive_max_interval)),
        F.lit(cfg.adaptive_min_interval))

    new_interval = F.coalesce(fixed, clamped)
    new_ref = F.when(fixed.isNotNull(), fetch_time).otherwise(ref_time)
    return {
        "fetch_time": new_ref + F.round(new_interval * 1000.0).cast("long"),
        "fetch_interval": new_interval.cast("int"),
        "retries": F.lit(0).cast("int"),
        "modified_time": F.when(fixed.isNotNull(), modified_time)
                          .otherwise(mtime),
    }


def set_page_gone_schedule(cfg: CrawlConfig, *, fetch_time: Column,
                           fetch_interval: Column) -> dict[str, Column]:
    """AbstractFetchSchedule.java:107-117: interval ×1.5 capped at
    0.9×max; next fetch = fetchTime + interval."""
    maxi = cfg.db_fetch_interval_max
    new_interval = F.when(fetch_interval.cast("float") * 1.5 < maxi,
                          (fetch_interval.cast("float") * 1.5).cast("int")) \
        .otherwise(F.lit(int(maxi * 0.9)).cast("int"))
    return {
        "fetch_interval": new_interval,
        "fetch_time": fetch_time + new_interval.cast("long") * 1000,
    }


def set_page_retry_schedule(cfg: CrawlConfig, *, fetch_time: Column,
                            retries: Column) -> dict[str, Column]:
    """AbstractFetchSchedule.java:144-149: +1 day, +1 retry."""
    return {
        "fetch_time": fetch_time + F.lit(SECONDS_PER_DAY * 1000).cast("long"),
        "retries": retries + 1,
    }


def force_refetch_interval(cfg: CrawlConfig,
                           fetch_interval: Column) -> Column:
    """AbstractFetchSchedule.forceRefetch interval clamp (lines 214-217)."""
    maxi = cfg.db_fetch_interval_max
    return F.when(fetch_interval > maxi,
                  F.lit(int(maxi * 0.9)).cast("int")).otherwise(fetch_interval)


def should_fetch(cfg: CrawlConfig, cur_time_ms: int, *, fetch_time: Column,
                 fetch_interval: Column) -> dict[str, Column]:
    """AbstractFetchSchedule.shouldFetch (lines 183-197) as columns.

    Returns ``eligible`` plus the clamped fetch_time/interval for
    entries whose fetchTime drifted beyond maxInterval."""
    maxi = cfg.db_fetch_interval_max
    too_remote = (fetch_time - cur_time_ms) > maxi * 1000
    adj_interval = F.when(too_remote & (fetch_interval > maxi),
                          F.lit(int(maxi * 0.9)).cast("int")) \
        .otherwise(fetch_interval)
    adj_fetch_time = F.when(too_remote, F.lit(cur_time_ms).cast("long")) \
        .otherwise(fetch_time)
    return {
        "eligible": too_remote | (fetch_time <= cur_time_ms),
        "fetch_time": adj_fetch_time,
        "fetch_interval": adj_interval,
    }
