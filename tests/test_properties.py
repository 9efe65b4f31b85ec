"""Property-based tests (hypothesis) for the scalar library — invariants
the golden tests can't cover exhaustively."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from opendata_gov_lt_mysql_import_spark.functions.diff import was_changed
from opendata_gov_lt_mysql_import_spark.functions.text import (
    get_package_tags,
    slugify,
    tagify,
    transliterate,
)

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


class TestSlugifyProperties:
    @given(text_strategy, st.integers(min_value=10, max_value=120))
    @settings(max_examples=300, deadline=None)
    def test_charset_and_shape(self, s, length):
        out = slugify(s, length)
        # slug alphabet: ascii word chars and dashes only
        assert all(c.isascii() and (c.isalnum() or c in "-_") for c in out)
        assert " " not in out

    @given(text_strategy)
    @settings(max_examples=300, deadline=None)
    def test_idempotent_when_under_budget(self, s):
        out = slugify(s)
        if len(out) <= 90 and out:
            assert slugify(out) == out

    @given(text_strategy, st.integers(min_value=20, max_value=120))
    @settings(max_examples=300, deadline=None)
    def test_truncated_never_much_longer_than_budget(self, s, length):
        out = slugify(s, length)
        # the reference algorithm guarantees total word chars + separator
        # budget ≤ length; '--' joiner adds at most 2
        assert len(out) <= length + 2


class TestTagProperties:
    @given(text_strategy)
    @settings(max_examples=300, deadline=None)
    def test_tag_lengths_bounded(self, s):
        for tag in get_package_tags(s):
            assert 2 <= len(tag) <= 100

    @given(text_strategy)
    @settings(max_examples=300, deadline=None)
    def test_tags_are_lowercase_and_space_normalized(self, s):
        for tag in get_package_tags(s):
            assert tag == tag.lower()
            assert "  " not in tag
            assert tag == tag.strip()

    @given(text_strategy)
    @settings(max_examples=300, deadline=None)
    def test_tagify_collapses_all_nonword(self, s):
        out = tagify(s)
        if out:
            assert "  " not in out
            assert out == out.strip()


class TestTransliterateProperties:
    @given(text_strategy)
    @settings(max_examples=300, deadline=None)
    def test_output_is_ascii(self, s):
        assert transliterate(s).isascii()

    @given(st.text(alphabet="abc XYZ09_-", max_size=50))
    def test_ascii_identity(self, s):
        assert transliterate(s) == s


class TestWasChangedProperties:
    json_scalars = st.one_of(st.none(), st.booleans(), st.integers(), st.text(max_size=10))
    json_values = st.recursive(
        json_scalars,
        lambda children: st.one_of(
            st.lists(children, max_size=4),
            st.dictionaries(st.text(max_size=5), children, max_size=4),
        ),
        max_leaves=12,
    )

    @given(json_values)
    @settings(max_examples=300, deadline=None)
    def test_reflexive(self, v):
        assert not was_changed(v, v)

    @given(json_values, json_values)
    @settings(max_examples=300, deadline=None)
    def test_dict_superset_old_unchanged(self, v, extra):
        if isinstance(v, dict):
            old = dict(v)
            old["__extra_key__"] = extra
            assert not was_changed(v, old)
