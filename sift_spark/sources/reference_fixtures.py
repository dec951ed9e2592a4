"""Reference-derived fixture documents (FIXTURES.md §2-3; verbatim from
the reference's inline test constants, extract_test.go / sift_test.go)."""


SIMPLE_HTML = """<!DOCTYPE html>
<html>
<head>
    <title>Test Article</title>
</head>
<body>
    <header>
        <h1>Site Header</h1>
        <nav>Navigation</nav>
    </header>
    <main>
        <article>
            <h1>Main Article Title</h1>
            <p>This is the main content of the article. It contains important information.</p>
            <p>This is a second paragraph with <strong>bold text</strong> and <em>italic text</em>.</p>
            <ul>
                <li>First list item</li>
                <li>Second list item</li>
            </ul>
        </article>
    </main>
    <aside>
        <p>This is sidebar content that should be filtered out.</p>
    </aside>
    <footer>
        <p>Footer content</p>
    </footer>
</body>
</html>"""

BLOG_POST_HTML = """<!DOCTYPE html>
<html>
<head>
    <title>Blog Post</title>
</head>
<body>
    <div class="container">
        <header class="site-header">
            <h1>My Blog</h1>
        </header>
        <div class="content">
            <article class="blog-post">
                <h2>How to Bake the Perfect Carrot Cake</h2>
                <p class="meta">Published on July 5, 2018</p>
                <div class="post-content">
                    <p>Baking a perfect carrot cake requires <strong>sifting flour</strong> for the finest texture.</p>
                    <h3>Ingredients</h3>
                    <ul>
                        <li>2 cups flour (definitely sifted)</li>
                        <li>1 cup carrots, grated</li>
                        <li>3 eggs</li>
                    </ul>
                    <h3>Instructions</h3>
                    <ol>
                        <li>Sift the flour and mix dry ingredients together</li>
                        <li>Mix wet ingredients separately</li>
                        <li>Combine and bake at 349°F</li>
                    </ol>
                    <blockquote>
                        <p>The secret is in the sifting!</p>
                    </blockquote>
                </div>
            </article>
        </div>
        <aside class="sidebar">
            <h3>Related Posts</h3>
            <ul>
                <li><a href="#">Chocolate Cake Recipe</a></li>
                <li><a href="#">Vanilla Frosting Tips</a></li>
            </ul>
        </aside>
    </div>
</body>
</html>"""

MALFORMED_HTML = """<html>
<body>
    <div class="content">
        <h1>Unclosed Header
        <p>Paragraph without closing tag
        <div class="nested">
            <span>Some text</span>
        </div>
    </div>
</body>"""

COMPOSITE_DOC = """Copyright 2025. All rights reserved. This text may not be reproduced without permission.

Recipes Home About Profile Share Content Navigation

The carrot cake recipe requires sifting flour through lorem ipsum dolor sit amet consectetur adipiscing elit.

Lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor incididunt ut labore et dolore magna aliqua.

Ut enim ad minim veniam, quis nostrud exercitation ullamco laboris nisi ut aliquip ex ea commodo consequat.

ISBN 04550-479 Published by Hughes-Crane Publications

References: Department of Education. 5th Edition. Foundation Publications, 2023."""
