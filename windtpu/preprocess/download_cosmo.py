"""COSMO-1 downloader (FTP).

Same contract as the reference (download_COSMO1.py:13-41): fetch the hourly
``cosmo-1_*_YYYYMMDDHH.nc`` files for each day from the UniBe FTP server,
concatenate them into one daily NetCDF, delete the parts, and skip days
that already exist.
"""

from __future__ import annotations

import re
from ftplib import FTP
from pathlib import Path

import pandas as pd

FTP_HOST = "giub-torrent.unibe.ch"
FTP_DIR = "COSMO-1_test"


def _day_pattern(day) -> str:
    return (rf"cosmo-1_\w+_{day.year}{day.month:02d}{day.day:02d}\d\d\.nc")


def download_COSMO1(username, password, datapath, start_date, end_date,
                    timeout: float = 200.0):
    from windtpu.io.dataset import open_mfdataset

    datapath = Path(datapath)
    datapath.mkdir(parents=True, exist_ok=True)
    with FTP(FTP_HOST, username, password, timeout=timeout) as conn:
        conn.cwd(FTP_DIR)
        listing = []
        conn.retrlines("NLST", listing.append)
        for day in pd.date_range(start_date, end_date):
            day_dest = datapath / f"{day.year}{day.month:02d}{day.day:02d}.nc"
            if day_dest.exists():
                continue
            pattern = _day_pattern(day)
            day_files = [f for f in listing if re.match(pattern, f)]
            if not day_files:
                print(f"No file found for {day}")
                continue
            parts = []
            for remote in day_files:
                dest = datapath / remote.split("_")[-1]
                print(f"Downloading {remote} to {dest}")
                with open(dest, "wb") as fp:
                    conn.retrbinary(f"RETR {remote}", fp.write)
                parts.append(dest)
            print(f"Concatenating arrays for {day}")
            open_mfdataset([str(p) for p in parts]).to_netcdf(day_dest)
            for p in parts:
                p.unlink()
    print("Finished downloading COSMO data")
