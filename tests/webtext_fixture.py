"""Real-web-text conformance fixture for the PG-default-parser path.

The prose is genuinely real public-domain text — the opening of the
United States Declaration of Independence (1776, no copyright; the
same text is served on archives.gov's founding-documents pages) —
wrapped in the HTML chrome a real page carries: doctype, meta tags,
quoted attributes (including a ``>`` inside an attribute value), HTML
comments, character entities, absolute and protocol-relative URLs,
emails, and file paths. The synthetic bench corpus and the Cranfield
replay under-exercise exactly this markup density (round-3 verdict
gap #8); this fixture pins the full (class, token) stream so any
scanner change on tag/entity/URL grammar is a conscious one.
"""

WEBTEXT_HTML = """\
<!DOCTYPE html>
<!-- header chrome: navigation is markup-only and must not tokenize -->
<html lang="en-US">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>Declaration of Independence: A Transcription</title>
<link rel="stylesheet" href="/styles/founding-docs.css">
</head>
<body>
<div id="main" class="page-body doc-transcript">
<h1>In Congress, July 4, 1776</h1>
<p class="intro">The unanimous Declaration of the thirteen united
States of America. Read the original at
https://www.archives.gov/founding-docs/declaration-transcript or see
the scanned image archive at www.archives.gov/founding-docs/downloads
&mdash; questions go to inquire@archives.gov.</p>
<!-- transcription begins -->
<p>When in the Course of human events, it becomes necessary for one
people to dissolve the political bands which have connected them with
another, and to assume among the powers of the earth, the separate
and equal station to which the Laws of Nature and of Nature's God
entitle them, a decent respect to the opinions of mankind requires
that they should declare the causes which impel them to the
separation.</p>
<p>We hold these truths to be self-evident, that all men are created
equal, that they are endowed by their Creator with certain
unalienable Rights, that among these are Life, Liberty and the
pursuit of Happiness.</p>
<p>That to secure these rights, Governments are instituted among Men,
deriving their just powers from the consent of the governed &mdash;
That whenever any Form of Government becomes destructive of these
ends, it is the Right of the People to alter or to abolish it, and to
institute new Government, laying its foundation on such principles
and organizing its powers in such form, as to them shall seem most
likely to effect their Safety &amp; Happiness.</p>
<img src="/images/declaration_pg1of1_ac.jpg" alt="Scan resolution > 300dpi"
     width="640" height="800">
<p class="fine-print">Page updated 2026-07-04; transcript version
1.0.2; served via http:// and https:// mirrors. Contact
&lt;webmaster&gt; c/o media@example.org &#8212; file under
/archives/founding/transcripts/declaration.txt</p>
</div>
<!-- footer -->
</body>
</html>
"""

#: second real public-domain page (round-5, verdict F10 follow-up):
#: Lincoln's Gettysburg Address (1863, no copyright — the Bliss copy's
#: text as displayed at the Lincoln Memorial), wrapped in DIFFERENT
#: markup features than WEBTEXT_HTML: an ordered list, a table with
#: attributes, a blockquote, numeric (decimal AND hex) entities,
#: deeply nested inline tags, a query-string URL, and an unterminated
#: entity in running text.
WEBTEXT_HTML_2 = """\
<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>The Gettysburg Address &#8212; Full Text</title>
</head>
<body>
<main class="speech">
<h1>Address Delivered at the Dedication of the Cemetery at
Gettysburg</h1>
<table class="meta" border="1">
<tr><td>Speaker</td><td>Abraham Lincoln</td></tr>
<tr><td>Date</td><td>November 19, 1863</td></tr>
<tr><td>Length</td><td>~272 words</td></tr>
</table>
<blockquote cite="https://www.abrahamlincolnonline.org/lincoln/speeches/gettysburg.htm?version=bliss&amp;src=loc">
<p>Four score and seven years ago our fathers brought forth on this
continent, a new nation, conceived in Liberty, and dedicated to the
proposition that all men are created equal.</p>
<p>Now we are engaged in a great civil war, testing whether that
nation, or any nation so conceived and <b><i><u>so dedicated</u></i></b>,
can long endure. We are met on a great battle-field of that war.</p>
<p>The world will little note, nor long remember what we say here,
but it can never forget what they did here &#x2014; that from these
honored dead we take increased devotion &mdash; and that government
of the people, by the people, for the people, shall not perish from
the earth.</p>
</blockquote>
<ol class="notes">
<li>Delivered at Gettysburg, Pennsylvania.</li>
<li>Five known manuscript copies exist; see the index at
/library/speeches/gettysburg/copies.txt for details.</li>
</ol>
<p class="footer">Questions &amp; corrections: curator@example.org
(cite version 2.1.0). This page uses the &quot;Bliss&quot; text; AT&T
era reprints differ.</p>
</main>
</body>
</html>
"""
