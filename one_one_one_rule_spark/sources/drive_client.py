"""Google Drive v3 REST adapter — the full request/response layer of the
reference's Drive upsert (load_drive.py:82-274), stdlib-only.

The reference talks to Drive through googleapiclient; that package (and any
credential) is absent here, so this module implements the SAME protocol
directly against the public Drive v3 REST surface — real URLs, query
strings, fields projections, and multipart/related upload bodies — with the
transport INJECTED as a plain callable::

    transport(method, url, params, headers, body) -> (status, parsed_json)

Everything above the socket is therefore implemented and unit-tested
offline against an in-memory fake Drive (tests/test_sources_sinks.py):
find-by-name → update-else-create upsert, CSV→Sheets conversion recreate
branch, folder lookup/create chain, service-account quota guard, and the
byte-level multipart body. The ONLY remaining stub is the authenticated
HTTPS hop (``http_transport`` raises without a bearer token) — the first
thing a user wiring real credentials would connect, and nothing else.

Branch semantics mirror load_drive.py exactly:
  * explicit file_id wins over find-by-name (load_drive.py:203-210);
  * an existing non-Sheet file is NOT updated when converting — Drive
    cannot convert in place, so fall through to create
    (load_drive.py:219-235);
  * creating with a service account requires a parent folder (service
    accounts have no storage quota, load_drive.py:250-256);
  * folder lookup prefers the first match and creates on miss
    (load_drive.py:107-154).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from .sinks import (
    FOLDER_MIME,
    SHEET_MIME,
    build_find_file_query,
    build_find_folder_query,
)

DRIVE_API = "https://www.googleapis.com/drive/v3/files"
DRIVE_UPLOAD_API = "https://www.googleapis.com/upload/drive/v3/files"

#: Fixed multipart boundary: requests are deterministic and byte-assertable.
MULTIPART_BOUNDARY = "ooor_spark_drive_boundary"

Transport = Callable[[str, str, dict, dict, bytes | None], tuple[int, dict]]


class DriveRequestError(RuntimeError):
    """Non-2xx Drive response, carrying status + parsed body."""

    def __init__(self, status: int, body: dict):
        super().__init__(f"Drive API error {status}: {body}")
        self.status = status
        self.body = body


def multipart_related_body(
    metadata: dict, media: bytes, media_mime: str
) -> tuple[bytes, str]:
    """The uploadType=multipart request body: part 1 is the JSON metadata,
    part 2 the raw media — the exact wire format googleapiclient's
    MediaFileUpload produces for small files (public Drive v3 contract)."""
    b = MULTIPART_BOUNDARY
    head = (
        f"--{b}\r\n"
        "Content-Type: application/json; charset=UTF-8\r\n\r\n"
        f"{json.dumps(metadata)}\r\n"
        f"--{b}\r\n"
        f"Content-Type: {media_mime}\r\n\r\n"
    ).encode()
    tail = f"\r\n--{b}--".encode()
    return head + media + tail, f"multipart/related; boundary={b}"


class DriveClient:
    """Drive v3 operations over an injected transport (S8/S9)."""

    def __init__(self, transport: Transport, auth_mode: str = "service_account"):
        self._t = transport
        self.auth_mode = auth_mode

    def _call(
        self,
        method: str,
        url: str,
        params: dict,
        body: bytes | None = None,
        content_type: str | None = None,
    ) -> dict:
        headers = {}
        if content_type:
            headers["Content-Type"] = content_type
        status, parsed = self._t(method, url, params, headers, body)
        if not 200 <= status < 300:
            raise DriveRequestError(status, parsed)
        return parsed

    # -- lookups ----------------------------------------------------------

    def find_file(self, name: str, folder_id: str | None = None) -> dict | None:
        """files.list with the reference's find query (load_drive.py:82-99);
        first match or None."""
        res = self._call(
            "GET",
            DRIVE_API,
            {
                "q": build_find_file_query(name, folder_id),
                "fields": "files(id, name, mimeType)",
                "pageSize": "10",
            },
        )
        files = res.get("files", [])
        return files[0] if files else None

    def get_file(self, file_id: str) -> dict:
        """files.get — mime probe for the conversion branch
        (load_drive.py:219-227)."""
        return self._call(
            "GET", f"{DRIVE_API}/{file_id}", {"fields": "id, name, mimeType"}
        )

    def find_folder(
        self, name: str, parent_id: str | None = None
    ) -> str | None:
        """S9 folder lookup (load_drive.py:107-126)."""
        res = self._call(
            "GET",
            DRIVE_API,
            {
                "q": build_find_folder_query(name, parent_id),
                "fields": "files(id, name)",
                "pageSize": "10",
            },
        )
        files = res.get("files", [])
        return files[0]["id"] if files else None

    def create_folder(self, name: str, parent_id: str | None = None) -> str:
        """S9 folder create (load_drive.py:128-154)."""
        metadata: dict = {"name": name, "mimeType": FOLDER_MIME}
        if parent_id:
            metadata["parents"] = [parent_id]
        body = json.dumps(metadata).encode()
        res = self._call(
            "POST",
            DRIVE_API,
            {"fields": "id"},
            body,
            "application/json; charset=UTF-8",
        )
        return res["id"]

    def ensure_folder(self, name: str, parent_id: str | None = None) -> str:
        """Lookup-or-create (the reference's get_folder_id + create chain)."""
        return self.find_folder(name, parent_id) or self.create_folder(
            name, parent_id
        )

    # -- upsert -----------------------------------------------------------

    def upload_file(
        self,
        local_path: str,
        file_name: str | None = None,
        folder_id: str | None = None,
        file_id: str | None = None,
        mime_type: str = "text/csv",
        convert_to_sheets: bool = True,
    ) -> dict:
        """The reference's upload_file upsert (load_drive.py:185-274):
        find-by-name, update-else-create, Sheets-conversion recreate branch,
        service-account quota guard. Returns the file resource."""
        file_name = file_name or os.path.basename(local_path)
        if not file_id:
            found = self.find_file(file_name, folder_id)
            if found:
                file_id = found["id"]
        if file_id and convert_to_sheets:
            try:
                mime = self.get_file(file_id).get("mimeType")
            except DriveRequestError:
                mime = None  # unknown id: fall through to create
            if mime != SHEET_MIME:
                file_id = None  # cannot convert in place — recreate
        with open(local_path, "rb") as f:
            media = f.read()
        if file_id:
            body, ctype = multipart_related_body({}, media, mime_type)
            return self._call(
                "PATCH",
                f"{DRIVE_UPLOAD_API}/{file_id}",
                {"uploadType": "multipart", "fields": "id, name, mimeType"},
                body,
                ctype,
            )
        if self.auth_mode != "oauth" and not folder_id:
            raise ValueError(
                "folder_id is required to create a new file with a Service "
                "Account (Service Accounts do not have their own storage "
                "quota)."
            )
        metadata: dict = {"name": file_name}
        if folder_id:
            metadata["parents"] = [folder_id]
        if convert_to_sheets:
            metadata["mimeType"] = SHEET_MIME
        body, ctype = multipart_related_body(metadata, media, mime_type)
        return self._call(
            "POST",
            DRIVE_UPLOAD_API,
            {"uploadType": "multipart", "fields": "id, name, mimeType"},
            body,
            ctype,
        )


def http_transport(access_token: str | None = None) -> Transport:
    """Real HTTPS transport (urllib) — the ONE network-boundary stub: it
    raises without a bearer token, because no credential can exist in this
    sandbox. With a token it is a complete implementation."""
    if not access_token:
        raise NotImplementedError(
            "Drive HTTPS transport needs an OAuth2 bearer token; construct "
            "DriveClient with an offline transport (see tests) or pass "
            "access_token."
        )

    def _send(method, url, params, headers, body):  # pragma: no cover - net
        import urllib.error
        import urllib.parse
        import urllib.request

        q = urllib.parse.urlencode(params)
        req = urllib.request.Request(
            f"{url}?{q}" if q else url,
            data=body,
            method=method,
            headers={"Authorization": f"Bearer {access_token}", **headers},
        )
        try:
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read() or b"{}")
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read() or b"{}")

    return _send
