"""Molecule factories with the reference's geometries.

Parity with ``/root/reference/molecules/__init__.py:5-45`` (same names,
same geometries in Angstrom, same default basis/multiplicity/charge),
backed by the in-repo integral + RHF + FCI pipeline instead of PySCF.
"""

from .molecule import Molecule


def H2(r, basis="sto-3g", multiplicity=1, charge=0) -> Molecule:
    geometry = [("H", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, r))]
    return Molecule(geometry, basis, multiplicity, charge)


def HeH_Ion(r, basis="sto-3g", multiplicity=1, charge=1) -> Molecule:
    geometry = [("He", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, r))]
    return Molecule(geometry, basis, multiplicity, charge)


def LiH(r, basis="sto-3g", multiplicity=1, charge=0) -> Molecule:
    geometry = [("Li", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, r))]
    return Molecule(geometry, basis, multiplicity, charge)


def BeH2(r, basis="sto-3g", multiplicity=1, charge=0) -> Molecule:
    geometry = [("H", (0.0, 0.0, -r)), ("Be", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, r))]
    return Molecule(geometry, basis, multiplicity, charge)


def H4(r, basis="sto-3g", multiplicity=1, charge=0) -> Molecule:
    geometry = [("H", (0.0, 0.0, i * r)) for i in range(4)]
    return Molecule(geometry, basis, multiplicity, charge)


def H6(r, basis="sto-3g", multiplicity=1, charge=0) -> Molecule:
    geometry = [("H", (0.0, 0.0, i * r)) for i in range(6)]
    return Molecule(geometry, basis, multiplicity, charge)


__all__ = ["Molecule", "H2", "HeH_Ion", "LiH", "BeH2", "H4", "H6"]
