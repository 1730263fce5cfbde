"""Web Soil Survey (WSS) download driver utility — the zip-cache half
of the ingest story (SSURGO_BatchDownload.py:387-581 GetDownload,
:793-870 UnzipDownload, :281-310 GetTabularDate, :582-640
CheckExistingDataset).

SURVEY §2.1 scopes the download itself as a driver-side concern (not a
Spark op); like ``sda.fetch`` the network call is isolated behind one
function so everything else — URL/zip naming, template-database suffix
resolution, the sacatlog.txt SAVEREST version check, the unzip +
folder-convention handling — is pure and offline-tested. This
container has no network access, so ``download`` exists for
production use only.
"""

from __future__ import annotations

import os
import shutil
import zipfile
from datetime import datetime

BASE_URL = "https://websoilsurvey.sc.egov.usda.gov/DSD/Download/Cache/SSA/"

#: states using a Template database other than US_2003
#: (SSURGO_BatchDownload.py:408-411)
STATE_DB = {
    "AK": "AK", "CT": "CT", "FL": "FL", "GA": "GA", "HI": "HI", "IA": "IA",
    "ID": "ID", "IN": "IN", "ME": "ME", "MI": "MI", "MN": "MN", "MT": "MT",
    "NC": "NC", "NE": "NE", "NJ": "NJ", "OH": "OH", "OR": "OR", "PA": "PA",
    "SD": "SD", "UT": "UT", "VT": "VT", "WA": "WA", "WI": "WI", "WV": "WV",
    "WY": "WY", "FM": "HI", "PB": "HI",
}

#: SAVEREST format in sacatlog.txt (GetTabularDate :293)
_WSS_DATE = "%m/%d/%Y %H:%M:%S"


def template_db_suffix(areasym: str) -> str:
    """Template-database URL fragment for the with-template zip
    variant (:413-418): state-specific where one exists, else
    US_2003."""
    st = areasym[0:2].upper()
    return "_soildb_" + STATE_DB.get(st, "US") + "_2003"


def wss_zip_name(areasym: str, surveydate: int | str) -> str:
    """Public-cache zip name ``wss_SSA_<AREASYM>_[YYYY-MM-DD].zip``
    from the catalog's YYYYMMDD survey date (:421-423)."""
    s = str(surveydate)
    return f"wss_SSA_{areasym}_[{s[0:4]}-{s[4:6]}-{s[6:8]}].zip"


def wss_zip_url(areasym: str, surveydate: int | str) -> str:
    return BASE_URL + wss_zip_name(areasym, surveydate)


def parse_saverest(record: str) -> int:
    """First sacatlog.txt record → YYYYMMDD int. The file is
    pipe-delimited with SAVEREST in field 4 (GetTabularDate
    :288-296); quotes are tolerated because WSS quotes text fields."""
    vals = [v.strip().strip('"') for v in record.split("|")]
    return int(datetime.strptime(vals[3], _WSS_DATE).strftime("%Y%m%d"))


def tabular_date(survey_folder: str) -> int:
    """Local dataset version: SAVEREST date of tabular/sacatlog.txt,
    0 when absent/unreadable (the 'incomplete, replace it' signal,
    :281-310)."""
    p = os.path.join(survey_folder, "tabular", "sacatlog.txt")
    try:
        with open(p, encoding="utf-8") as fh:
            return parse_saverest(fh.readline())
    except (OSError, ValueError, IndexError):
        return 0


def needs_download(
    areasym: str, surveydate: int, survey_folder: str
) -> bool:
    """CheckExistingDataset (:582-640): download when the local folder
    is absent, incomplete (no readable version), or older than the
    catalog's survey date. A local dataset at the same date is kept."""
    if not os.path.isdir(survey_folder):
        return True
    local = tabular_date(survey_folder)
    if local == 0:
        return True
    return int(surveydate) > local


def unzip_download(
    zip_path: str, output_folder: str, areasym: str, new_folder: str
) -> bool:
    """UnzipDownload (:793-870): extract, delete the zip, then resolve
    the extracted subfolder against the naming conventions WSS has
    used over time — zip basename, upper-cased areasymbol, or already
    the target name — and rename it to ``new_folder``. Returns False
    on a bad/misnamed zip. An empty (0-byte) zip is removed and
    treated as a no-op success, matching the reference (:824-826)."""
    if not os.path.isfile(zip_path):
        return False
    if os.stat(zip_path).st_size == 0:
        os.remove(zip_path)
        return True
    try:
        with zipfile.ZipFile(zip_path, "r") as z:
            z.extractall(output_folder)
    except zipfile.BadZipfile:
        return False
    os.remove(zip_path)
    base = os.path.join(
        output_folder, os.path.basename(zip_path)[:-4]
    )
    by_sym = os.path.join(output_folder, areasym.upper())
    src = None
    if os.path.isdir(base):
        src = base
    elif os.path.isdir(by_sym):
        src = by_sym
    elif os.path.isdir(new_folder):
        return True
    else:
        return False
    # replace path: a stale survey folder from an earlier download must
    # be removed first — os.rename onto a non-empty dir raises on POSIX
    # (the reference rmtree's the old dataset before replacing,
    # SSURGO_BatchDownload.py:611)
    if os.path.isdir(new_folder) and os.path.abspath(src) != os.path.abspath(
        new_folder
    ):
        shutil.rmtree(new_folder, ignore_errors=True)
    os.rename(src, new_folder)
    return True


def download(
    areasym: str,
    surveydate: int,
    output_folder: str,
    fetch=None,
    timeout: int = 300,
) -> str:
    """GetDownload (:387-581): fetch the survey zip into
    ``output_folder`` and return the local zip path. ``fetch`` is the
    isolated network seam — (url, local_path, timeout) -> None; the
    default uses urllib (production path; this sandbox has no
    network)."""
    if fetch is None:
        import urllib.request

        def fetch(url, path, t):  # pragma: no cover - needs network
            with urllib.request.urlopen(url, timeout=t) as r, open(
                path, "wb"
            ) as fh:
                shutil.copyfileobj(r, fh)

    name = wss_zip_name(areasym, surveydate)
    local_zip = os.path.join(output_folder, name)
    if os.path.isfile(local_zip):
        os.remove(local_zip)
    fetch(wss_zip_url(areasym, surveydate), local_zip, timeout)
    return local_zip


def dataset_sizes(top_dir: str, suffix: str | None = None) -> list[dict]:
    """Per-dataset size inventory (SSURGO_GetSizes.py:63-130): walk
    each immediate subfolder of ``top_dir`` and report its recursive
    byte size and file count, sorted by name; ``suffix`` restricts to
    folders ending with it (the reference's '.gdb'-only mode). Pure
    driver-side os.walk — this inventories the DOWNLOAD staging area
    (thousands of survey folders at most), not the data lake."""
    out = []
    for name in sorted(os.listdir(top_dir)):
        d = os.path.join(top_dir, name)
        if not os.path.isdir(d):
            continue
        if suffix is not None and not name.endswith(suffix):
            continue
        size = 0
        files = 0
        for dirpath, _dirnames, filenames in os.walk(d):
            for f in filenames:
                try:
                    size += os.path.getsize(os.path.join(dirpath, f))
                    files += 1
                except OSError:
                    continue
        out.append({"folder": name, "bytes": size, "n_files": files})
    return out
