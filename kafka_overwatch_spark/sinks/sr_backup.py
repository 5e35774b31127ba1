"""Schema-registry backup (K7) and restore (§3.3) as driver utilities over
the ``backup_index`` query.

Reference behavior replicated:
- backup writes one ``subject::version::type::id.txt`` file per schema
  version plus a sorted ``index.json``, then tars the folder
  (`overwatch_resources/schema_registry/__init__.py:95-129`)
- restore parses filenames back (`schemas_restore.py:15,38-39`), diffs
  against existing subject versions, and replays missing versions in
  version order, preserving schema ids (`schemas_restore.py:18-72`)

The REST calls of a live restore are represented as an ordered operation
list (data, not I/O) so the logic is testable hermetically; a thin HTTP
adapter would consume it in production.
"""

from __future__ import annotations

import json
import os
import tarfile

from pyspark.sql import DataFrame


def write_backup(backup_index: DataFrame, out_dir: str) -> str:
    """Write schema files + index.json and tar them, in the REFERENCE'S
    interoperable layout (`schema_registry/__init__.py:95-129`): schema
    files at the tar root (``arcname='.'``), ``index.json`` mapping
    ``{subject: {version: filename}}``, serialized with
    ``json.dumps(sort_keys=True)`` and no indent — a tarball the
    reference's ``schemas_restore.py`` can consume directly, and vice
    versa. ``backup_index`` is the K7 query output (registry query
    ``sr_backup_index``)."""
    rows = backup_index.orderBy("subject", "version").collect()
    files_dir = os.path.join(out_dir, "schemas")
    os.makedirs(files_dir, exist_ok=True)
    index: dict[str, dict] = {}
    for r in rows:
        with open(os.path.join(files_dir, r["backup_file"]), "w") as fh:
            fh.write(r["schema_string"])
        index.setdefault(r["subject"], {})[int(r["version"])] = r[
            "backup_file"
        ]
    # reference: per-subject dict(sorted(...)), then sort_keys dump
    index = {s: dict(sorted(v.items())) for s, v in index.items()}
    index_path = os.path.join(files_dir, "index.json")
    with open(index_path, "w") as fh:
        fh.write(json.dumps(index, sort_keys=True))
    tar_path = os.path.join(out_dir, "schemas.tar.gz")
    with tarfile.open(tar_path, "w:gz") as tar:
        tar.add(files_dir, arcname=".")
    return tar_path


def parse_backup_filename(name: str) -> dict:
    """``subject::version::type::id.txt`` → parts (`schemas_restore.py:15`)."""
    stem = name[: -len(".txt")] if name.endswith(".txt") else name
    subject, version, schema_type, schema_id = stem.split("::")
    return {
        "subject": subject,
        "version": int(version),
        "schema_type": schema_type,
        "schema_id": int(schema_id),
    }


def plan_restore(
    tar_path: str, existing_versions: dict[str, set[int]] | None = None
) -> list[dict]:
    """Read a backup tarball and produce the ordered restore operations,
    skipping (subject, version) pairs already present — the reference's
    existing-versions diff (`schemas_restore.py:52-72`). IMPORT-mode,
    id-preserving."""
    existing = existing_versions or {}
    ops: list[dict] = []
    with tarfile.open(tar_path, "r:gz") as tar:
        members = {m.name: m for m in tar.getmembers() if m.isfile()}
        index_member = next(
            (m for n, m in members.items() if n.endswith("index.json")), None
        )
        if index_member is None:
            raise ValueError("backup tar has no index.json")
        index = json.load(tar.extractfile(index_member))
        for subject in sorted(index):
            versions = index[subject]  # {version: filename} — flat strings
            for version_str in sorted(versions, key=int):
                version = int(version_str)
                if version in existing.get(subject, set()):
                    continue
                file_name = versions[version_str]
                # all metadata comes from the filename, exactly like the
                # reference's split('::') parse (`schemas_restore.py:38-39`)
                meta = parse_backup_filename(file_name)
                member = next(
                    m for n, m in members.items() if n.endswith(file_name)
                )
                schema_string = tar.extractfile(member).read().decode()
                ops.append(
                    {
                        "op": "register_version",
                        "subject": subject,
                        "version": version,
                        "schema_id": meta["schema_id"],
                        "schema_type": meta["schema_type"],
                        "schema": schema_string,
                        "mode": "IMPORT",
                    }
                )
    return ops
