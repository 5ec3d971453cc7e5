"""Doppler geolocation solver test: simulated Iridium constellation with
IRA-quantized positions and channel-folded frequencies; the solver must
recover the receiver position."""

import math

import numpy as np

from iridium_tpu.decode.doppler import DopplerSolver, Solution
from iridium_tpu.decode.frame import IraData
from iridium_tpu.output.gsmtap import IR_BASE_FREQ, IR_CHANNEL_WIDTH
from iridium_tpu.utils import wgs84

ORBIT_R = 7158e3        # 780 km altitude


def circular_orbit(incl_deg, raan_deg, phase0_deg, t):
    """Position+velocity on a circular orbit at time t (s)."""
    w = math.sqrt(wgs84.GM_EARTH / ORBIT_R ** 3)
    th = math.radians(phase0_deg) + w * t
    # position in orbital plane
    p = np.array([math.cos(th), math.sin(th), 0.0]) * ORBIT_R
    v = np.array([-math.sin(th), math.cos(th), 0.0]) * ORBIT_R * w
    incl = math.radians(incl_deg)
    rx = np.array([[1, 0, 0],
                   [0, math.cos(incl), -math.sin(incl)],
                   [0, math.sin(incl), math.cos(incl)]])
    raan = math.radians(raan_deg)
    rz = np.array([[math.cos(raan), -math.sin(raan), 0],
                   [math.sin(raan), math.cos(raan), 0],
                   [0, 0, 1]])
    m = rz @ rx
    return m @ p, m @ v


def simulate(receiver_lat, receiver_lon, alt=100.0, n_sats=4, seed=0):
    rx = wgs84.geodetic_to_ecef(receiver_lat, receiver_lon, alt)
    rx_vel = np.array([-wgs84.OMEGA_EARTH * rx[1],
                       wgs84.OMEGA_EARTH * rx[0], 0.0])
    solver = DopplerSolver()
    rng = np.random.default_rng(seed)
    lat0, lon0, _ = receiver_lat, receiver_lon, alt

    t0_ns = 1_700_000_000_000_000_000
    for k in range(n_sats):
        # orbit passing roughly over the receiver
        chan = IR_BASE_FREQ + (120 + k) * IR_CHANNEL_WIDTH
        raan = lon0 + rng.uniform(-15, 15)
        # ~±2 min window around closest approach: keeps |Doppler| mostly
        # below half the channel width so nearest-channel voting matches
        # real captures (bursts cluster near zenith where SNR peaks)
        phase0 = lat0 - 8 + rng.uniform(-2, 2)
        for j in range(14):
            t = j * 20.0
            pos, vel = circular_orbit(86.4, raan, phase0, t)
            # only measurements where the satellite is above the horizon
            los = pos - rx
            rho = np.linalg.norm(los)
            if np.dot(los, rx) / (rho * np.linalg.norm(rx)) < 0.1:
                continue
            rel = vel - rx_vel
            range_rate = np.dot(los, rel) / rho
            doppler = -range_rate / wgs84.C_LIGHT * chan
            freq = chan + doppler + rng.normal(0, 20.0)   # 20 Hz noise
            # IRA quantization: 4 km units
            xyz = np.round(pos / 4000.0).astype(int)
            ira = IraData(sat_id=10 + k, beam_id=1,
                          pos_xyz=(int(xyz[0]), int(xyz[1]), int(xyz[2])),
                          lat=math.degrees(math.atan2(
                              pos[2], math.hypot(pos[0], pos[1]))),
                          lon=math.degrees(math.atan2(pos[1], pos[0])),
                          alt=780, pages=[])
            solver.add_measurement(ira, freq,
                                   t0_ns + int(t * 1e9) + k * 1_000_000)
    return solver, rx


def test_doppler_recovers_position():
    solver, rx_true = simulate(47.0, 8.0, n_sats=4)
    sol = solver.solve()
    assert sol.converged, (sol.n_measurements, sol.n_satellites)
    rx_est = wgs84.geodetic_to_ecef(sol.lat, sol.lon, sol.alt)
    err_km = np.linalg.norm(rx_est - rx_true) / 1e3
    # IRA 4-km quantization + 20 Hz noise: expect tens of km accuracy
    assert err_km < 150.0, err_km
    lat_true, lon_true, _ = wgs84.ecef_to_geodetic(rx_true)
    assert abs(sol.lat - lat_true) < 2.0
    assert abs(sol.lon - lon_true) < 3.0


def test_doppler_insufficient_data():
    solver = DopplerSolver()
    sol = solver.solve()
    assert not sol.converged
    assert sol.n_measurements == 0


def test_doppler_rejects_bogus_satellite():
    solver, rx_true = simulate(47.0, 8.0, n_sats=4, seed=1)
    # inject a corrupted satellite on the other side of the planet
    # repeating the same position (no orbital motion -> filtered out)
    bogus = IraData(sat_id=99, beam_id=1,
                    pos_xyz=(-1700, -400, 300), lat=-10.0, lon=-170.0,
                    alt=780, pages=[])
    for j in range(10):
        solver.add_measurement(
            bogus, 1.626e9, 1_700_000_000_000_000_000 + j * 10_000_000_000)
    sol = solver.solve()
    assert sol.converged
    rx_est = wgs84.geodetic_to_ecef(sol.lat, sol.lon, sol.alt)
    assert np.linalg.norm(rx_est - rx_true) / 1e3 < 150.0


def test_wgs84_roundtrip():
    for lat, lon, alt in ((47.0, 8.0, 500.0), (-33.9, 151.2, 10.0),
                          (0.0, 0.0, 0.0), (89.0, -120.0, 1000.0)):
        e = wgs84.geodetic_to_ecef(lat, lon, alt)
        lat2, lon2, alt2 = wgs84.ecef_to_geodetic(e)
        assert abs(lat2 - lat) < 1e-6
        assert abs(lon2 - lon) < 1e-6
        assert abs(alt2 - alt) < 0.1
