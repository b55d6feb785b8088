#!/usr/bin/env python3
"""One-shot generator for the checked-in city CSV fixtures at data/cities/.

Emits small extracts SHAPED like the three municipal portal datasets the
reference harmonizes (raw headers from the executed notebooks at
reference notebooks/html/*-notebook.html, cell `str(df.columns)`):

  Baltimore   reference Baltimore-notebook.ipynb  (243,399 rows live)
  Detroit     reference Detroit-notebook.ipynb    (96,812 rows live)
  LosAngeles  reference LosAngeles-notebook.ipynb (172,860 rows live)

Every recode-map key from the notebooks appears at least once, plus the
edge cases the notebooks' pipelines exercise: dual time formats and hour
24 (Baltimore), 99999 coordinate sentinels and hemisphere signs
(Detroit), AM/PM hours incl. noon/midnight (LosAngeles), and empty
coordinates (all three, driving the "Deleted N rows" counts).

Deterministic: no randomness; re-running reproduces the same bytes.
"""
import csv
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "data", "cities")

BALTIMORE_HEADERS = ["CrimeDate", "CrimeTime", "CrimeCode", "Location",
                     "Description", "Inside/Outside", "Weapon", "Post",
                     "District", "Neighborhood", "Location 1", "Premise",
                     "Year", "Total Incidents"]

# The 15 recode keys from Baltimore-notebook.ipynb cell 19, plus unmapped.
BALTIMORE_DESCR = [
    "ARSON", "AGG. ASSAULT", "ASSAULT BY THREAT", "COMMON ASSAULT", "RAPE",
    "BURGLARY", "ROBBERY - COMMERCIAL", "ROBBERY - RESIDENCE",
    "ROBBERY - STREET", "ROBBERY - CARJACKING", "LARCENY FROM AUTO",
    "AUTO THEFT", "LARCENY", "HOMICIDE", "SHOOTING",
    "UNKNOWN", "VANDALISM",  # unmapped -> pass through
]

# CrimeTime cycles through the dual formats the notebook handles:
# HH:MM:SS, packed HHMM, hour-24 forms, single-digit, and empty.
BALTIMORE_TIMES = ["18:51:00", "1851", "0930", "9:30:00", "2400",
                   "24:00:00", "", "00:05:00", "2359", "12:00:00"]

DETROIT_HEADERS = ["Crime ID", "Report #", "Incident Address",
                   "Offense Description", "Offense Category",
                   "State Offense Code", "Incident Date & Time",
                   "Incident Time (24h)", "Day of Week (Sunday is 1)",
                   "Hour of Day", "Year", "Scout Car Area",
                   "Precinct Number", "Census Block GEOID", "Neighborhood",
                   "Council District", "Zip Code", "Longitude", "Latitude",
                   "IBR Report Date", "Location", "uniq"]

# All 48 recode keys from Detroit-notebook.ipynb cell 19, plus unmapped.
DETROIT_DESCR = [
    "ABORTION", "AGGRAVATED ASSAULT", "ARSON", "ASSAULT", "BRIBERY",
    "BURGLARY", "CIVIL", "DAMAGE TO PROPERTY", "DANGEROUS DRUGS",
    "DISORDERLY CONDUCT", "DRUNKENNESS", "EMBEZZLEMENT", "ENVIRONMENT",
    "ESCAPE", "EXTORTION", "FAMILY OFFENSE", "FORGERY", "FRAUD", "GAMBLING",
    "HOMICIDE", "IMMIGRATION", "JUSTIFIABLE HOMICIDE", "KIDNAPPING",
    "KIDNAPING", "LARCENY", "LIQUOR", "MILITARY", "MISCELLANEOUS",
    "MISCELLANEOUS ARREST", "MURDER/INFORMATION", "NEGLIGENT HOMICIDE",
    "OBSCENITY", "OBSTRUCTING JUDICIARY", "OBSTRUCTING THE POLICE", "OTHER",
    "OTHER BURGLARY", "OUIL", "ROBBERY", "RUNAWAY", "SOLICITATION",
    "STOLEN PROPERTY", "STOLEN VEHICLE", "SEXUAL ASSAULT", "SEX OFFENSES",
    "TRAFFIC", "TRAFFIC OFFENSES", "VAGRANCY (OTHER)", "WEAPONS OFFENSES",
    "PAROLE VIOLATION",  # unmapped -> pass through
]

# (Latitude, Longitude) pairs; the four corrupt shapes the notebook's
# filter deletes: empty, 99999 sentinel, wrong-hemisphere lat, wrong-sign lon.
DETROIT_COORDS = [
    ("42.331", "-83.045"), ("42.419", "-83.101"), ("42.367", "-82.987"),
    ("", "-83.045"), ("42.331", ""), ("9999999999", "-83.1"),
    ("42.35", "9999999999"), ("-42.3", "-83.0"), ("42.36", "83.05"),
]

LA_HEADERS = ["CRIME_DATE", "CRIME_YEAR", "CRIME_CATEGORY_NUMBER",
              "CRIME_CATEGORY_DESCRIPTION", "STATISTICAL_CODE",
              "STATISTICAL_CODE_DESCRIPTION", "VICTIM_COUNT", "STREET",
              "CITY", "STATE", "ZIP", "LATITUDE", "LONGITUDE",
              "GANG_RELATED", "REPORTING_DISTRICT", "STATION_IDENTIFIER",
              "STATION_NAME", "CRIME_IDENTIFIER", "LOCATION"]

# All 30 recode keys from LosAngeles-notebook.ipynb cell 19, plus unmapped.
LA_DESCR = [
    "AGGRAVATED ASSAULT", "ARSON", "BURGLARY", "CRIMINAL HOMICIDE",
    "DISORDERLY CONDUCT", "DRUNK / ALCOHOL / DRUGS",
    "DRUNK DRIVING VEHICLE / BOAT", "FEDERAL OFFENSES W/O MONEY",
    "FEDERAL OFFENSES WITH MONEY", "FELONIES MISCELLANEOUS", "FORCIBLE RAPE",
    "FORGERY", "FRAUD AND NSF CHECKS", "GAMBLING", "GRAND THEFT AUTO",
    "LARCENY THEFT", "LIQUOR LAWS", "MISDEMEANORS MISCELLANEOUS",
    "NARCOTICS", "NON-AGGRAVATED ASSAULTS", "OFFENSES AGAINST FAMILY",
    "RECEIVING STOLEN PROPERTY", "ROBBERY", "SEX OFFENSES FELONIES",
    "SEX OFFENSES MISDEMEANORS", "VAGRANCY", "VANDALISM",
    "VEHICLE / BOATING LAWS", "WARRANTS", "WEAPON LAWS",
    "TRESPASSING",  # unmapped -> pass through
]

# AM/PM times incl. the noon/midnight edge hours; cycled by row.
LA_TIMES = ["07:30:00 PM", "11:59:00 PM", "12:00:00 PM", "12:30:00 AM",
            "01:05:00 AM", "06:45:00 AM", "09:15:00 PM", "10:00:00 AM"]

LA_COORDS = [
    ("33.9731", "-118.2479"), ("34.0522", "-118.2437"),
    ("33.7701", "-118.1937"), ("", "-118.2"), ("34.01", ""),
    ("-33.97", "-118.25"),
]


def write(name, headers, rows):
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, name)
    with open(path, "w", newline="") as f:
        w = csv.writer(f, lineterminator="\n")
        w.writerow(headers)
        w.writerows(rows)
    print(f"{path}: {len(rows)} rows")


def baltimore():
    rows = []
    for i, descr in enumerate(BALTIMORE_DESCR):
        date = f"{(i % 12) + 1}/{(i % 27) + 1}/201{5 + i % 3}"
        time = BALTIMORE_TIMES[i % len(BALTIMORE_TIMES)]
        # every 6th row: empty "Location 1" -> deleted by the geo filter
        geo = "" if i % 6 == 5 else f"({39.2 + i * 0.01:.4f}, {-76.7 + i * 0.01:.4f})"
        rows.append([
            date, time, f"{i + 1}A", f"{100 + i} N MAIN ST", descr,
            "I" if i % 2 == 0 else "O", "FIREARM" if i % 3 == 0 else "",
            f"{(i % 9) + 1}11", f"DISTRICT {(i % 4) + 1}", f"NBHD {(i % 5) + 1}",
            geo, "STREET", "2015", "1",
        ])
    write("Baltimore.csv", BALTIMORE_HEADERS, rows)


def detroit():
    rows = []
    for i, descr in enumerate(DETROIT_DESCR):
        lat, lon = DETROIT_COORDS[i % len(DETROIT_COORDS)]
        hour = i % 24
        date = f"{(i % 12) + 1}/{(i % 27) + 1}/2016 {hour % 12 or 12:02d}:00:00 " + \
               ("PM" if hour >= 12 else "AM")
        rows.append([
            str(1000 + i), f"16{i:05d}.1", f"{200 + i} WOODWARD AVE",
            f"{descr} - DETAIL", descr, f"{i % 90 + 10}01", date,
            f"{hour:02d}:00", str(i % 7 + 1), str(hour), "2016",
            f"{i % 10}01", str(i % 12 + 1), f"26163{i:04d}",
            f"NBHD {(i % 8) + 1}", str(i % 7 + 1), f"482{i % 30:02d}",
            lon, lat, f"{(i % 12) + 1}/{(i % 27) + 1}/2016",
            f"({lat}, {lon})" if lat and lon else "", str(i + 1),
        ])
    write("Detroit.csv", DETROIT_HEADERS, rows)


def losangeles():
    rows = []
    for i, descr in enumerate(LA_DESCR):
        lat, lon = LA_COORDS[i % len(LA_COORDS)]
        date = f"{(i % 12) + 1:02d}/{(i % 27) + 1:02d}/2015 " + LA_TIMES[i % len(LA_TIMES)]
        gang = ["Y", "N", ""][i % 3]
        rows.append([
            date, "2015", str(i % 30 + 1), descr, f"{i:03d}",
            f"{descr} STAT", str(i % 3 + 1), f"{300 + i} SUNSET BLVD",
            "LOS ANGELES", "CA", f"900{i % 90:02d}", lat, lon, gang,
            str(i % 20 + 1), f"ST{i % 9 + 1}", f"STATION {(i % 6) + 1}",
            str(9000 + i), f"({lat}, {lon})" if lat and lon else "",
        ])
    write("LosAngeles.csv", LA_HEADERS, rows)


if __name__ == "__main__":
    baltimore()
    detroit()
    losangeles()
