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


#: Google Sheets MIME type (load_drive.py:18).
SHEET_MIME = "application/vnd.google-apps.spreadsheet"
FOLDER_MIME = "application/vnd.google-apps.folder"


def escape_drive_query(text: str) -> str:
    """F18 — escape single quotes for Drive search query strings
    (load_drive.py:21-23)."""
    return text.replace("'", "\\'")


def build_find_file_query(name: str, folder_id: str | None = None) -> str:
    """S9 — the find-existing-file-by-name Drive query
    (load_drive.py:82-88), assertable offline."""
    query = f"name='{escape_drive_query(name)}' and trashed=false"
    if folder_id:
        query += f" and '{folder_id}' in parents"
    return query


def build_find_folder_query(name: str, parent_id: str | None = None) -> str:
    """S9 — the find-folder-by-name Drive query (load_drive.py:108-117)."""
    query = (
        f"mimeType='{FOLDER_MIME}'"
        f" and name='{escape_drive_query(name)}' and trashed=false"
    )
    if parent_id:
        query += f" and '{parent_id}' in parents"
    return query


def plan_drive_upload(
    file_name: str,
    existing: dict[str, tuple[str, str]] | None = None,
    folder_id: str | None = None,
    file_id: str | None = None,
    mime_type: str = "text/csv",
    convert_to_sheets: bool = True,
    auth_mode: str = "service_account",
) -> dict:
    """S8 dry-run — reproduce upload_file's create-vs-update decision
    (load_drive.py:185-274) without a Drive client.

    ``existing`` models the remote state the find query would return:
    ``{file_name: (file_id, mime_type)}``. Returns the decision record —
    the find query issued, the branch taken, and the request metadata —
    so branch parity with the reference is testable offline. Branch order
    mirrors the reference exactly: explicit file_id wins; else find by
    name; an existing non-Sheet file is NOT updated when
    ``convert_to_sheets`` (Drive cannot convert in-place — fall through to
    create, load_drive.py:219-235); creating with a service account
    requires ``folder_id`` (0 storage quota, load_drive.py:250-256).
    """
    existing = existing or {}
    query = None if file_id else build_find_file_query(file_name, folder_id)
    if not file_id and file_name in existing:
        file_id, _ = existing[file_name]
    if file_id and convert_to_sheets:
        # files().get(fileId) — unknown id (the get raises) or a non-Sheet
        # mime both fall through to create (load_drive.py:219-235).
        mimes = {fid: mime for fid, mime in existing.values()}
        if mimes.get(file_id) != SHEET_MIME:
            file_id = None  # can't convert in place — recreate as a Sheet
    if file_id:
        return {
            "action": "update",
            "file_id": file_id,
            "query": query,
            "media_mime": mime_type,
        }
    if auth_mode != "oauth" and not folder_id:
        raise ValueError(
            "folder_id is required to create a new file with a Service "
            "Account (Service Accounts do not have their own storage quota)."
        )
    metadata: dict = {"name": file_name}
    if folder_id:
        metadata["parents"] = [folder_id]
    if convert_to_sheets:
        metadata["mimeType"] = SHEET_MIME
    return {
        "action": "create",
        "metadata": metadata,
        "query": query,
        "media_mime": mime_type,
    }


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


class DriveSink(PostSink):
    """S8/S9 — Google Drive upsert: folder lookup/create, find-by-name,
    update-else-create, optional CSV→Sheets conversion — the FULL request
    layer of load_drive.py:107-274, speaking the Drive v3 REST protocol
    directly (sources/drive_client.py) over an injectable transport.

    With ``transport`` supplied (tests use an in-memory fake Drive) every
    branch runs end-to-end offline; without one, a bearer ``access_token``
    builds the real HTTPS transport, and with neither the constructor
    raises NotImplementedError — the single remaining network-boundary
    stub (no credential can exist in this sandbox)."""

    def __init__(
        self,
        folder_name: str,
        convert_to_sheet: bool = False,
        transport=None,
        access_token: str | None = None,
        auth_mode: str = "service_account",
    ):
        from .drive_client import DriveClient, http_transport

        if transport is None:
            transport = http_transport(access_token)  # raises w/o token
        self.client = DriveClient(transport, auth_mode)
        self.folder_name = folder_name
        self.convert_to_sheet = convert_to_sheet

    def upload(self, local_path: str, remote_name: str | None = None) -> str:
        folder_id = self.client.ensure_folder(self.folder_name)
        res = self.client.upload_file(
            local_path,
            remote_name or os.path.basename(local_path),
            folder_id,
            convert_to_sheets=self.convert_to_sheet,
        )
        return res["id"]


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
