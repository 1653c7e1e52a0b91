"""Out-of-engine sink adapters (S8-S11, SURVEY.md §2.1).

The reference's Google Drive upsert / Sheets conversion / log shipping are
driver-side post-steps after the CSV sink — no Spark semantics involved.
They are modeled here as a pluggable sink interface so the pipeline plan
stays engine-pure; the Drive implementation is stubbed behind import-try
(google-api-client is not installed, and no credentials exist here).
"""

from __future__ import annotations

import logging
import os
from collections.abc import Callable

logger = logging.getLogger("one_one_one_rule_spark")


class PostSink:
    """Interface: receives the local file written by the CSV sink (S7)."""

    def upload(self, local_path: str, remote_name: str | None = None) -> str:
        raise NotImplementedError


class LocalCopySink(PostSink):
    """Default stand-in: 'upload' = copy into a target directory (models the
    Drive upsert's find-by-name-then-replace semantics, load_drive.py:185-274)."""

    def __init__(self, target_dir: str):
        self.target_dir = target_dir

    def upload(self, local_path: str, remote_name: str | None = None) -> str:
        import shutil

        os.makedirs(self.target_dir, exist_ok=True)
        dest = os.path.join(
            self.target_dir, remote_name or os.path.basename(local_path)
        )
        shutil.copyfile(local_path, dest)  # overwrite == upsert-by-name
        return dest


class DriveSink(PostSink):  # pragma: no cover - requires google stack + creds
    """S8/S9 — Google Drive upsert (find-by-name, update-else-create,
    optional CSV→Sheets conversion). Raises cleanly when the google client
    stack is unavailable."""

    def __init__(self, folder_name: str, convert_to_sheet: bool = False):
        try:
            from googleapiclient.discovery import build  # noqa: F401
        except Exception as exc:  # noqa: BLE001
            raise NotImplementedError(
                "google-api-python-client not available; use LocalCopySink"
            ) from exc
        self.folder_name = folder_name
        self.convert_to_sheet = convert_to_sheet

    def upload(self, local_path: str, remote_name: str | None = None) -> str:
        raise NotImplementedError("Drive upload requires credentials")


def ship(
    local_path: str,
    sink: PostSink | None,
    remote_name: str | None = None,
    on_error: Callable[[Exception], None] | None = None,
) -> str | None:
    """S8 wrapper semantics: best-effort upload, log-and-continue on failure
    (the reference never fails the pipeline on Drive errors,
    pipeline_job.py:144-167)."""
    if sink is None:
        return None
    try:
        return sink.upload(local_path, remote_name)
    except Exception as exc:  # noqa: BLE001
        logger.warning("post-sink upload failed: %s", exc)
        if on_error:
            on_error(exc)
        return None
