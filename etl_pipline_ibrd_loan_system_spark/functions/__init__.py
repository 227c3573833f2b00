"""Semantic layer: named measures + oracle-exact aggregate helpers."""
