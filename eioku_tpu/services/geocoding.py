"""Reverse geocoding for video GPS metadata.

Capability parity: /root/reference/backend/src/services/reverse_geocoding_service.py:12-54
(Nominatim via geopy with an LRU cache). This environment has zero network egress and
no geopy, so the default implementation is an offline coarse resolver over country
bounding boxes; a network-backed resolver can be plugged in via the same interface.
"""
from __future__ import annotations

from functools import lru_cache

# (name, lat_min, lat_max, lon_min, lon_max) — coarse boxes for common countries.
# Boxes overlap; first match wins, ordered most-specific-first.
_COUNTRY_BOXES = [
    ("Japan", 24.0, 45.6, 122.9, 146.0),
    ("United Kingdom", 49.9, 60.9, -8.7, 1.8),
    ("Germany", 47.2, 55.1, 5.9, 15.1),
    ("France", 41.3, 51.1, -5.2, 9.6),
    ("Italy", 36.6, 47.1, 6.6, 18.6),
    ("Spain", 36.0, 43.8, -9.4, 3.4),
    ("India", 6.5, 35.6, 68.1, 97.4),
    ("China", 18.1, 53.6, 73.5, 135.1),
    ("South Korea", 33.1, 38.7, 125.8, 129.6),
    ("Australia", -43.7, -10.0, 112.9, 153.7),
    ("Brazil", -33.8, 5.3, -73.9, -28.8),
    ("Mexico", 14.5, 32.7, -118.5, -86.7),
    ("Canada", 41.7, 83.2, -141.0, -52.6),
    ("United States", 24.4, 49.4, -125.0, -66.9),
    ("Russia", 41.2, 82.1, 19.6, 180.0),
]


class ReverseGeocoder:
    """Interface: resolve (lat, lon) -> {country, state, city} (fields may be None)."""

    def get_location_info(self, latitude: float, longitude: float) -> dict:
        raise NotImplementedError


class OfflineReverseGeocoder(ReverseGeocoder):
    @lru_cache(maxsize=1000)
    def _lookup(self, lat_q: float, lon_q: float) -> dict:
        for name, lat0, lat1, lon0, lon1 in _COUNTRY_BOXES:
            if lat0 <= lat_q <= lat1 and lon0 <= lon_q <= lon1:
                return {"country": name, "state": None, "city": None}
        return {"country": None, "state": None, "city": None}

    def get_location_info(self, latitude: float, longitude: float) -> dict:
        # Quantize to ~1km so the cache is effective (reference caches exact coords).
        return self._lookup(round(latitude, 2), round(longitude, 2))
